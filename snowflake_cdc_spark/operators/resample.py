"""Time-series resampling with linear interpolation — project each
key's irregular observations onto a regular grid (the hypertable /
`time_bucket_gapfill(interpolate)` workload; q86 gap-fills counts, q98
forward-fills — this lane INTERPOLATES values between observations).

Single-shuffle shape (the asof.py union-merge, run in BOTH directions
at once): grid points and observations union into one keyed stream, ONE
per-key sort, then two stacked window passes over the same sort order —
``last(value, ignorenulls)`` over the preceding frame gives the
previous observation, ``first(value, ignorenulls)`` over the following
frame gives the next. No grid×observations join, no per-pair blow-up;
Spark plans one Sort with stacked Window operators.

Interpolation at grid time t between (t0,v0) and (t1,v1):
``v0 + (v1-v0) * ((t-t0)/(t1-t0))`` on epoch-microsecond integers cast
to double (exact below 2^52) — written token-identically in the oracle
so both engines produce bit-identical doubles; the emitted value is
round_half_up'd per the determinism contract. Boundary semantics:
before the first observation -> next value (backfill); after the last
-> previous value (hold); exactly AT an observation -> that value
(observations sort before grid points at equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.vectors import round_half_up


def interpolate_resample(
    observations: DataFrame,
    grid: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grid_ts_col: str = "grid_ts",
    round_to: int = 4,
) -> DataFrame:
    """(key, grid_ts, value): linear interpolation of each key's
    observations at each of its grid timestamps."""
    obs = observations.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__side"),  # observations before grid at equal ts
        F.col(value_col).cast("double").alias("__v"),
    )
    g = grid.select(
        F.col(key_col).alias("__k"),
        F.col(grid_ts_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__v"),
    )
    merged = obs.unionByName(g)
    order = [F.col("__t"), F.col("__side")]
    w_prev = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # explicit cast: ts columns are TIMESTAMP_NTZ by the engine contract
    # and unix_micros only accepts TIMESTAMP — the cast is an identity
    # under the UTC session tz (q162 hit this; here a union happened to
    # coerce to LTZ already, but that's an accident, not a contract)
    us = F.unix_micros(F.col("__t").cast("timestamp")).cast("double")
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(F.col("__v").isNotNull(), us), True).over(w_prev)
    next_v = F.first("__v", ignorenulls=True).over(w_next)
    next_t = F.first(F.when(F.col("__v").isNotNull(), us), True).over(w_next)
    interp = F.when(
        prev_v.isNull(), next_v
    ).when(
        next_v.isNull() | (next_t == prev_t), prev_v
    ).otherwise(
        prev_v + (next_v - prev_v) * ((us - prev_t) / (next_t - prev_t))
    )
    return (
        merged.withColumn("__iv", interp)
        .filter(F.col("__side") == 1)
        .select(
            F.col("__k").alias(key_col),
            F.col("__t").alias(grid_ts_col),
            round_half_up(F.col("__iv"), round_to).alias("value"),
        )
        .orderBy(key_col, grid_ts_col)
    )
