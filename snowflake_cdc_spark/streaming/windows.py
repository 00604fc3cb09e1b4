"""Watermarked event-time aggregation (SURVEY.md §2.8).

The reference has no event-time semantics — lateness is absorbed by
upsert-by-key (late event loses the seq race). For the analytics surface
we expose the real thing: watermark + windowed aggregation, where the
watermark bounds state (windows older than max_event_time - delay are
finalized and dropped) and discards too-late rows. Batch execution of the
same expression ignores the watermark, which is exactly Spark's
documented batch/stream contract — the parity test exploits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .event_time import ensure_event_time


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts with a watermark when the input is
    streaming (bounded state + late-data policy), identical expression in
    batch. Output: (win_start, *group_cols, n)."""
    df = ensure_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *(group_cols or []))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), *(group_cols or []), "n")
    )
