"""Event-time windowing + grouping-set coverage Q45-Q48 (SURVEY.md §2.8
streaming semantics, §2.4 aggregations).

The reference has no event-time windows (micro-batch processing-time only,
README.md:60) — these are engine capabilities beyond it, required for any
analytics surface. Tumbling/sliding/session windows are implemented with
Spark's native ``window``/``session_window`` functions, which work
identically over batch DataFrames and Structured Streams (with watermarks)
— so the DuckDB batch oracle checks the exact semantics the streaming path
uses."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries import DEC, _t, ntz, register


@register(
    "q45_tumbling_window",
    """SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS win_start, event_type,
              count(*) AS n,
              ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "event-time tumbling window (15 min) — streaming-identical semantics, "
    "batch-oracle-checked",
)
def q45(spark, sf_dir):
    return ntz(
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
        .orderBy("win_start", "event_type")
    )


@register(
    "q46_sliding_window",
    """WITH b AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bkt, value FROM events),
       w AS (SELECT unnest([bkt, bkt - INTERVAL 15 MINUTE]) AS win_start, value FROM b)
       SELECT win_start, count(*) AS n,
              ROUND(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM w GROUP BY 1 ORDER BY 1""",
    "sliding window (30 min, 15 min slide): each event lands in 2 windows",
)
def q46(spark, sf_dir):
    return ntz(
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total")
        .orderBy("win_start")
    )


@register(
    "q47_session_window",
    """WITH x AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM events),
       s AS (SELECT user_id, ts,
                    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM x)
       SELECT user_id, date_trunc('second', min(ts)) AS session_start, count(*) AS n
       FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "session window (30 min gap) via native session_window; oracle rebuilds "
    "identical sessions with lag + running break-count",
)
def q47(spark, sf_dir):
    return ntz(
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_trunc("second", F.col("w.start")).alias("session_start"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q48_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
              ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qty
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "ROLLUP grouping sets (subtotals + grand total as NULL keys)",
)
def q48(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias("qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q49_approx_distinct",
    """SELECT l_returnflag,
              CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              count(*) AS n,
              TRUE AS within_bound
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "A-family scale path: approx_count_distinct (HyperLogLog++) per group — "
    "constant memory per group vs the exact shuffle. Restated as a "
    "deterministic bounded-error check (round-3): Spark emits the exact "
    "per-group distinct count plus a boolean asserting the HLL estimate "
    "(rsd=0.02, deterministic xxhash sketch) lands within 5% relative "
    "error; the oracle emits the exact side + literal TRUE, so the row is "
    "fully hash-checkable without pretending the sketch value itself is "
    "portable across engines",
)
def q49(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q48b_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "CUBE grouping sets (all marginal combinations)",
)
def q48b(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )
