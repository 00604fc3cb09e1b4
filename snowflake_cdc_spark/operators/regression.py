"""Grouped ordinary-least-squares trend — "is this metric drifting, per
group?" — with an EXACT RATIONAL answer (the q136/q157/q160 integer
discipline applied to regression).

Float OLS (`regr_slope`, or sums of doubles) is order-nondeterministic
across engines and partitionings. Here both variables are integers by
construction — y quantized at its native resolution, x bucketed to a
coarse unit (hours) chosen so every intermediate fits in BIGINT with
wide margin — and the closed-form slope

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²)

is emitted as its exact (numerator, denominator) pair rather than a
divided float: nothing is rounded anywhere, so the per-group trend
hash-matches bit-for-bit. One scan, one map-side-combined aggregation;
the five sufficient statistics are the only state per group (the
classic distributed-regression layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_ols_rational(
    df: DataFrame,
    group_col: str,
    x_int: Column,
    y_int: Column,
) -> DataFrame:
    """(group, n_events, slope_num, slope_den): exact OLS slope of
    ``y_int`` on ``x_int`` (both integer Columns) per group. The caller
    owns the integer encoding — and with it the overflow budget:
    |n·Σxy| must stay under 2^63 (document the bound at the call
    site)."""
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(x_int).cast("bigint").alias("sx"),
        F.sum(y_int).cast("bigint").alias("sy"),
        F.sum(x_int * x_int).cast("bigint").alias("sxx"),
        F.sum(x_int * y_int).cast("bigint").alias("sxy"),
    )
    return agg.select(
        group_col,
        "n_events",
        (F.col("n_events") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n_events") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("slope_den"),
    ).orderBy(group_col)
