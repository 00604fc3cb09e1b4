"""Streaming exact dedup (N1 on streams): watermark-bounded
``dropDuplicates`` / ``dropDuplicatesWithinWatermark``.

Exact dedup over an unbounded stream needs bounded state, and Spark only
evicts dedup state on watermark advance when the event-time column is
PART OF THE DEDUP KEYS — a ``withWatermark`` next to a
``dropDuplicates(subset)`` that omits the time column is inert and the
state store grows forever. So the default mode dedups on
``subset + [ts_col]`` (exact-replay dedup: duplicates carry the same
event time — true for re-delivered records). For at-least-once sources
that re-emit with FRESH timestamps, ``within_watermark=True`` uses
``dropDuplicatesWithinWatermark(subset)``, whose state is
watermark-bounded by construction.

Batch execution mirrors the same keys so stream/batch parity holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .event_time import ensure_event_time


def dedup_stream(
    events: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    within_watermark: bool = False,
) -> DataFrame:
    df = ensure_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(subset)
        return df.dropDuplicates([*subset, ts_col])
    if within_watermark:
        # batch approximation: global dedup on the subset alone
        return df.dropDuplicates(subset)
    return df.dropDuplicates([*subset, ts_col])
