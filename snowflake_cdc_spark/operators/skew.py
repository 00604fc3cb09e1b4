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
side; salting covers aggregation/window skew; ``skew_profile`` (q188)
is the ahead-of-time diagnostic that tells you which treatment a key
needs before the job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.rank import skewed_count_rank


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
    ordering that max_by's struct comparison can't express).

    NOT wired into the pipeline, by measurement (VERDICT r07 #6,
    docs/PLANS.md round-8 probe): on Spark >= 3.5 the plain
    ``row_number()...filter(rn == 1)`` plan gets a map-side
    ``WindowGroupLimit Partial`` below the Exchange — the optimizer
    already two-phases the hot key — so salting's second window pass
    LOSES at every skew level (0.44s window vs 0.67s salted at 90% hot,
    5M rows). Use this form only where WindowGroupLimit cannot fire:
    rank predicates the rule can't push (rn > 1 survivors, full
    ordering without a top-k filter) or engines without the rule."""
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


def skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """One-row join-key skew profile of ``key_col`` (NULLs excluded) —
    the AHEAD-OF-TIME diagnostic beside the mitigation helpers above
    (they react to skew; this reports it so salting/broadcast decisions
    can be made from stats, q188): row count, distinct count, heaviest
    key + its count, and an EXACT-RATIONAL Gini concentration over the
    per-key counts — G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)),
    x ascending by (count, key) — emitted as its (num, den) BIGINT pair
    (the q162/q174 rational discipline; float Gini is an
    order-dependent sum). G ~ 0: uniform keys, shuffle freely; G -> 1:
    a handful of keys carry the table — salt or broadcast. ``top_key``
    is rendered as a STRING so non-numeric key columns profile
    correctly (ADVICE r05: a bigint cast silently NULLed them).

    Scale shape: everything after the per-key count aggregation runs on
    the DISTINCT-KEY relation, and the Gini rank over it is SORT-FREE
    (``operators/rank.py::skewed_count_rank`` — exact-count buckets +
    md5 sub-buckets, so even a billion-distinct-key profile never
    funnels through one partition); the heaviest key comes from a
    min-over-struct in the same final aggregate.
    BIGINT headroom |n * s1| < 2^63 caps at ~3e9 distinct keys x 3e9
    rows — beyond that, profile per partition-range and merge."""
    cnt = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # sort-free rank of the distinct-key relation (VERDICT r05 #1:
    # row_number over an unpartitioned window single-partitions at
    # billion-key joins): exact-count buckets + md5(key) sub-buckets.
    # Tied counts rank in md5(key) order, which the Gini numerator
    # Σ rn·c cannot see (c is constant inside a tie block — the
    # operators/rank.py tie-block contract), so it still equals the
    # oracle's (c, key)-ordered formulation exactly
    ranked = skewed_count_rank(cnt, "c", "key", ascending=True)
    return ranked.agg(
        F.lit(label).alias("key_col"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (-F.min(F.struct((-F.col("c")).alias("nc"), F.col("key")))["nc"])
        .cast("bigint")
        .alias("max_count"),
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("key")))["key"]
        .cast("string")
        .alias("top_key"),
        (2 * F.sum(F.col("rn") * F.col("c"))
         - (F.count(F.lit(1)) + 1) * F.sum("c"))
        .cast("bigint")
        .alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("c")).cast("bigint").alias("gini_den"),
    )
