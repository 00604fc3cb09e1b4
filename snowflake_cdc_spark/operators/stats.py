"""Field statistics (SURVEY.md §2.4 A1/A2) — the reference's inspection
surface (value distributions add_output.py:524-525, first/last-seen
add_output.py:264-274) computed on demand with plain aggregations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_distribution(df: DataFrame, field: str, take: int = 100_000) -> DataFrame:
    """Distinct values of ``field`` with counts, most frequent first —
    the discovery scan of add_output.py:524-534 (take=100000 lists tables;
    take=0 probes existence). Hash-aggregate with map-side combine; the
    limit happens after a single shuffle on the grouping key."""
    out = (
        df.groupBy(field)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.col(field))
    )
    return out.limit(take) if take > 0 else out.limit(0)


def first_last_seen(df: DataFrame, field: str, ts_col: str = "ts") -> DataFrame:
    """Earliest/latest event time at which ``field`` held data
    (add_output.py:264-274). Empty input → one row of NULLs (the reference
    crashes on this, TODO at add_output.py:272 — we don't)."""
    return df.filter(F.col(field).isNotNull()).agg(
        F.min(ts_col).alias("first_seen"), F.max(ts_col).alias("last_seen")
    )


def backfill_start(first_seen_values: list, pad_minutes: int = 1):
    """Earliest of several first-seen times minus a skew pad
    (add_output.py:201-203, 656). Driver-side: the inputs are scalars."""
    from datetime import timedelta

    vals = [v for v in first_seen_values if v is not None]
    if not vals:
        return None
    return min(vals) - timedelta(minutes=pad_minutes)
