"""CUSUM change-point detection per group — "when did this metric's
level shift?" (deployment regressions, pipeline drift), with the
q136/q162 exact-arithmetic treatment.

The CUSUM statistic is the running sum of deviations from the group
mean; its extremum marks the most likely single change point. Means are
fractions, so the statistic is SCALED by the group count: with integer
observations y_i (quantize at native resolution),

    S_k = Σ_{i<=k} (n·y_i − Y)      (Y = Σy, n = count)

is ``n×`` the classic CUSUM — same argmax, every value an exact BIGINT.
The change point is the position of max |S_k| (ties to the earliest
position), and the reported magnitude is the exact integer |S| (its
natural unit: observation-resolution × n).

Shape: two window passes over one per-group sort (running sum, then
max+argmax via a struct-ordered max) plus a broadcast of the per-group
totals — no global order anywhere; per-group sorts are bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    order_col: str | list[str],
    y_int: Column,
) -> DataFrame:
    """(group, n, cp_index, cp_max_abs): per group, the 1-based position
    (in ``order_col`` order) maximizing |S_k|, with its exact scaled
    magnitude. ``y_int`` must be an integer Column; the caller owns the
    overflow budget (|n·y| summed — document at the call site)."""
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(y_int).cast("bigint").alias("__Y"),
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = (
        df.join(F.broadcast(totals), group_col)
        .withColumn("__dev", F.col("__n") * y_int - F.col("__Y"))
        .withColumn("__s", F.sum("__dev").over(run))
        .withColumn("__k", F.row_number().over(w))
    )
    # argmax |S| with earliest-position ties: max of (|s|, -k) structs
    best = scored.groupBy(group_col).agg(
        F.max("__n").alias("n"),
        F.max(
            F.struct(
                F.abs(F.col("__s")).alias("a"), (-F.col("__k")).alias("nk")
            )
        ).alias("__b"),
    )
    return best.select(
        group_col,
        F.col("n"),
        (-F.col("__b.nk")).cast("bigint").alias("cp_index"),
        F.col("__b.a").cast("bigint").alias("cp_max_abs"),
    ).orderBy(group_col)
