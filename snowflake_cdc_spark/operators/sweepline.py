"""Interval concurrency via a BUCKETED sweep line — "how many sessions
were active at once, per hour" (capacity planning, rate-limit audits,
concurrency billing).

The textbook sweep line sorts ALL boundary events globally and takes a
running sum — a single total order, the anti-pattern every scale lane
here avoids (q120/q140 precedent). The bucketed form keeps the exact
same answer with NO global data sort:

1. each interval contributes (+1 at start, -1 at end) boundary rows;
   each boundary belongs to exactly ONE time bucket (its hour);
2. boundaries are pre-aggregated to a NET delta per (bucket, instant),
   so the within-bucket running sum (a bounded per-bucket sort over
   DISTINCT instants) only ever takes instant-complete concurrency
   values — half-open ``[start, end)`` semantics fall out because an
   end at t cancels a start at t inside the same net delta;
3. the carry-in for a bucket = sum of ALL prior buckets' net deltas —
   a running total over the tiny bucket-level table (the only
   ``Window.orderBy`` without a partition, over hours, not rows; the
   q140 broadcast-offsets shape);
4. peak(bucket) = max of concurrency over {bucket start} ∪ {boundary
   instants}: carry_in + max(running sum) covers every boundary
   instant, and the bare carry_in covers the bucket-start instant —
   valid ONLY when no boundary sits exactly at the bucket start (a
   boundary there already includes its net delta in the running sum,
   and sessions ending exactly at the bucket start were never alive
   inside the half-open bucket). So: peak = carry + max_run when the
   first instant == bucket start, else greatest(carry, carry +
   max_run). This makes the peak the exact per-bucket maximum even for
   buckets whose first boundary is an end (ADVICE r05).

Determinism: pure integer deltas over distinct instants — the running
sum is a function of t alone, so the max is order/layout-invariant.
Hash-checkable against the oracle running the same decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency_by_bucket(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "hour",
    include_empty_buckets: bool = False,
) -> DataFrame:
    """(bucket_ts, n_starts, peak): per time bucket, how many intervals
    begin in it and the maximum number simultaneously active within it
    (half-open intervals: an interval ending exactly when another starts
    does not overlap it).

    By default only buckets CONTAINING a boundary appear — a bucket
    spanned entirely by one long session (no starts, no ends inside it)
    emits no row, though sessions are active throughout. With
    ``include_empty_buckets=True`` the full bucket spine between the
    first and last boundary bucket is emitted; a boundary-free bucket
    reports ``n_starts = 0`` and ``peak = carry`` (the sessions running
    straight through it). The spine is generated with ``sequence()``
    over the bucket RANGE (timeline-sized, like the carry window — not
    data-sized) and ``bucket`` must then be one of hour/day/week so the
    stride is a fixed interval."""
    _STRIDES = {"hour": "interval 1 hour", "day": "interval 1 day",
                "week": "interval 7 days"}
    starts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = intervals.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
    b = starts.unionByName(ends).withColumn(
        "bkt", F.date_trunc(bucket, F.col("t"))
    )
    # pre-aggregate the NET delta per instant: the running sum then only
    # ever exposes instant-complete concurrency values (a row-frame over
    # raw boundary rows leaks intermediate values inside a tied group of
    # -1 rows and overstates the peak when several intervals end at the
    # same timestamp)
    per_instant = b.groupBy("bkt", "t").agg(
        F.sum("delta").alias("delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_starts"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = per_instant.withColumn("run", F.sum("delta").over(w_in))
    per_bucket = swept.groupBy("bkt").agg(
        F.max("run").alias("max_run"),
        F.min("t").alias("t0"),
        F.sum("delta").alias("net"),
        F.sum("n_starts").cast("bigint").alias("n_starts"),
    )
    if include_empty_buckets:
        stride = _STRIDES[bucket]  # unsupported bucket: loud KeyError
        ext = per_bucket.agg(F.min("bkt").alias("lo"), F.max("bkt").alias("hi"))
        spine = ext.select(
            F.explode(F.expr(f"sequence(lo, hi, {stride})")).alias("bkt")
        )
        per_bucket = spine.join(per_bucket, "bkt", "left").select(
            "bkt",
            "max_run",  # NULL marks a boundary-free bucket
            "t0",
            F.coalesce(F.col("net"), F.lit(0)).alias("net"),
            F.coalesce(F.col("n_starts"), F.lit(0))
            .cast("bigint")
            .alias("n_starts"),
        )
    # carry-in: running net of PRIOR buckets — the only unpartitioned
    # window, over the bucket-count-sized table
    w_carry = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_bucket.withColumn(
            "carry", F.coalesce(F.sum("net").over(w_carry), F.lit(0))
        )
        .select(
            F.col("bkt").alias("bucket_ts"),
            "n_starts",
            # the bucket-start instant is a peak candidate (= bare carry)
            # only when no boundary sits exactly there; otherwise that
            # instant's concurrency is already carry + run(t0). A
            # boundary-free spine bucket (max_run NULL) is the carry
            # throughout — explicit guard, not greatest()'s null-skip
            F.when(F.col("max_run").isNull(), F.col("carry"))
            .when(
                F.col("t0") == F.col("bkt"),
                F.col("carry") + F.col("max_run"),
            )
            .otherwise(
                F.greatest(F.col("carry"), F.col("carry") + F.col("max_run"))
            )
            .cast("bigint")
            .alias("peak"),
        )
        .orderBy("bucket_ts")
    )
