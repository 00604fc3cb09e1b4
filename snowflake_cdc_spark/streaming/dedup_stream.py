"""Streaming exact dedup (N1 on streams): watermark-bounded
``dropDuplicates`` / ``dropDuplicatesWithinWatermark``.

Exact dedup over an unbounded stream needs bounded state: the watermark
caps how long a key's "seen" bit is retained (a duplicate older than the
delay is passed through — the classic completeness/state trade).
``dropDuplicatesWithinWatermark`` additionally dedups events whose OWN
timestamps differ but fall inside the watermark window — the right
semantics for at-least-once sources that re-emit with fresh ingest
timestamps. Batch execution of the same expression dedups globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(subset)
    return df.dropDuplicates(subset)
