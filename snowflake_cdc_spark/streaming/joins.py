"""Watermarked stream-stream interval join (SURVEY.md §2.8 streaming
surface; the reference has no join operator at all — §2.5).

A stream-stream equi-join alone would need unbounded state (any future
right row might match any past left row). Bounding it needs both: (a)
watermarks on both inputs, and (b) a time-range predicate tying the two
event times together, from which Spark derives state-eviction watermarks
for each side. This helper packages the correct form so callers can't
accidentally build the unbounded variant.

Batch execution of the identical expression ignores watermarks (Spark's
documented batch/stream contract), which the parity test exploits: same
helper, same predicate, file-stream availableNow vs plain batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .event_time import ensure_event_time

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose ``right_ts`` falls within
    ``[left_ts - max_lag, left_ts]`` for the same ``key``.

    Columns are disambiguated with ``l_`` / ``r_`` prefixes (except the
    shared key, emitted once). State per side is bounded by
    ``watermark + max_lag``.
    """
    left = ensure_event_time(left, left_ts)
    right = ensure_event_time(right, right_ts)
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    if l.isStreaming:
        l = l.withWatermark(f"l_{left_ts}", watermark)
    if r.isStreaming:
        r = r.withWatermark(f"r_{right_ts}", watermark)

    lt, rt = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (rt >= lt - F.expr(f"INTERVAL {max_lag}"))
        & (rt <= lt)
    )
    joined = l.join(r, cond, how)
    return joined.withColumnRenamed(f"l_{key}", key).drop(f"r_{key}")
