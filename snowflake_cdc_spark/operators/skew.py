"""Join-key skew profiler — the shuffle-planning diagnostic a
warehouse runs BEFORE committing to a join strategy (AQE's skew-join
handling reacts at runtime; this lane reports the distribution so
salting/broadcast decisions can be made from stats, the way the
engine's own q131 domain-cap and LSH mega-bucket caps already are).

Per candidate key: row count, distinct count, the heaviest key and its
count, and an EXACT-RATIONAL Gini concentration coefficient over the
per-key counts — G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with
x ascending — emitted as its (numerator, denominator) BIGINT pair (the
q162/q174 rational-output discipline; a float Gini would be an
order-dependent sum). G ~ 0 means uniform keys (shuffle freely),
G -> 1 means a handful of keys carry the table (salt or broadcast).

Scale shape: everything after the per-key count aggregation runs on
the DISTINCT-KEY relation (the q166 skyline posture — the only window
sort is over counts, |distinct keys| rows, never the data); the
heaviest key comes from a min-over-struct, no second pass. BIGINT
headroom: |n * s1| < 2^63 caps at ~3e9 distinct keys x 3e9 rows —
beyond that, profile per partition-range and merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """One-row skew profile of ``key_col`` (NULLs excluded)."""
    cnt = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = cnt.withColumn(
        "rn", F.row_number().over(Window.orderBy("c", "key"))
    )
    return ranked.agg(
        F.lit(label).alias("key_col"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (-F.min(F.struct((-F.col("c")).alias("nc"), F.col("key")))["nc"])
        .cast("bigint")
        .alias("max_count"),
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("key")))["key"]
        .cast("bigint")
        .alias("top_key"),
        (2 * F.sum(F.col("rn") * F.col("c"))
         - (F.count(F.lit(1)) + 1) * F.sum("c"))
        .cast("bigint")
        .alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("c")).cast("bigint").alias("gini_den"),
    )
