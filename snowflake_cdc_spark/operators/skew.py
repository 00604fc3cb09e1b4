"""Skew mitigation (SURVEY.md §7 hard-point 5, §2.8 scale posture).

The default latest-by-key path (``max_by`` aggregation) is already
skew-resistant: partial aggregation collapses each hot key to one row per
map partition before the shuffle. These helpers cover the cases that
AREN'T automatically two-phase:

- window-function plans (``row_number`` over a hot key puts every change
  row for that key in one task) → ``salted_latest_by_key``;
- ``count_distinct`` (shuffles every distinct value of a hot group) →
  ``count_distinct_two_phase``.

AQE's skew-join splitting (on by default in session.py) covers the join
side; salting covers aggregation/window skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase latest-by-key for window-style plans: phase 1 takes the
    local winner per (key, salt) — a hot key's rows split across
    ``salt_buckets`` tasks — phase 2 races the ≤salt_buckets survivors.
    Equivalent to ``latest_by_key``; exists for plans that must stay on
    the window operator (e.g. when ties need deterministic multi-column
    ordering that max_by's struct comparison can't express)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(F.col(seq_col).desc())
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__salt")
    )


def count_distinct_two_phase(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Exact distinct count per group without shuffling every duplicate
    value: phase 1 dedups (group, value) pairs (map-side combine eats the
    duplicates), phase 2 counts the survivors. NULL values are excluded,
    matching SQL ``COUNT(DISTINCT x)``. Output: group_cols + n."""
    return (
        df.select(*group_cols, value_col)
        .filter(F.col(value_col).isNotNull())
        .dropDuplicates([*group_cols, value_col])
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
