"""Extended relational coverage Q36-Q44 (SURVEY.md §2.5/§2.6): classic
TPC-H-shaped analytics, the remaining window functions, explode /
higher-order arrays, union-by-name over drifted schemas, conditional
aggregation, date arithmetic, and the string-predicate surface."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.queries import DEC, _t, ntz, register


@register(
    "q36_tpch_q3_style",
    """SELECT o_orderkey,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
              CAST(o_orderdate AS DATE) AS odate
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
             AND l_shipdate > TIMESTAMP '1997-01-01'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "TPC-H Q3 shape: selective filters pushed to 3 scans, broadcast dim, top-k",
)
def q36(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .select(
            "o_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("odate")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q37_tpch_q5_style",
    """SELECT n_name,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
       FROM region JOIN nation ON n_regionkey = r_regionkey
                   JOIN customer ON c_nationkey = n_nationkey
                   JOIN orders ON o_custkey = c_custkey
                   JOIN lineitem ON l_orderkey = o_orderkey
       WHERE r_name IN ('ASIA', 'EUROPE')
       GROUP BY n_name ORDER BY n_name""",
    "TPC-H Q5 shape: 5-table star join, dims broadcast, one fact shuffle",
)
def q37(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "q38_lead_last",
    """SELECT user_id, event_id,
              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
              last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_type,
              first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_type
       FROM events ORDER BY user_id, event_id""",
    "W2 completion: lead / first_value / last_value over full-partition frames",
)
def q38(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.lead("event_type").over(w).alias("next_type"),
            F.last("event_type").over(wfull).alias("final_type"),
            F.first("event_type").over(w).alias("first_type"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q39_explode_wordcount",
    """SELECT w AS word, count(*) AS n
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY w ORDER BY n DESC, word LIMIT 20""",
    "explode + aggregation (the array surface of SURVEY.md §2.6 at scale: "
    "generate → map-side combine → single shuffle)",
)
def q39(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@register(
    "q40_union_by_name",
    """SELECT k, count(*) AS n, ROUND(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM (
         SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL BY NAME
         SELECT o_totalprice AS v, o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 1
       ) GROUP BY k ORDER BY k LIMIT 100""",
    "U1 union-by-name: column order differs between branches (drifted-schema "
    "alignment, SURVEY.md §2.7)",
)
def q40(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_totalprice").alias("v"), F.col("o_orderkey").alias("k")
    )
    return (
        a.unionByName(b)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast(DEC)).cast("double"), 2).alias("total"),
        )
        .orderBy("k")
        .limit(100)
    )


@register(
    "q41_conditional_agg",
    """SELECT l_returnflag,
              count(*) AS n,
              count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_large,
              ROUND(CAST(sum(CASE WHEN l_discount > 0.05
                            THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS discounted_price,
              CAST(coalesce(max(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS max_f_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "when/otherwise + coalesce inside aggregation (conditional surface §2.6)",
)
def q41(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_large"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_discount") > 0.05, F.col("l_extendedprice").cast(DEC)
                    ).otherwise(F.lit(0).cast(DEC))
                ).cast("double"),
                2,
            ).alias("discounted_price"),
            F.coalesce(
                F.max(
                    F.when(F.col("l_linestatus") == "F", F.col("l_quantity").cast("bigint"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("max_f_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q42_date_arithmetic",
    """SELECT event_id,
              CAST(ts + INTERVAL 90 MINUTE AS TIMESTAMP) AS ts_pad,
              date_diff('day', TIMESTAMP '2024-01-01', ts) AS days_in,
              CAST(date_part('hour', ts) AS BIGINT) AS hh
       FROM events WHERE event_id < 1000 ORDER BY event_id""",
    "timestamp +/- INTERVAL, datediff, extract (temporal surface §2.6; the "
    "reference's -1min backfill pad arithmetic, add_output.py:656)",
)
def q42(spark, sf_dir):
    return ntz(
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_pad"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("days_in"),
            F.hour("ts").cast("bigint").alias("hh"),
        )
        .orderBy("event_id")
    )


@register(
    "q43_string_surface",
    """SELECT o_orderkey,
              upper(o_orderstatus) AS up, lower(o_orderpriority) AS lo,
              trim(concat('  ', o_orderstatus, '  ')) AS trimmed,
              substring(o_orderpriority, 1, 1) AS pr1,
              length(o_orderpriority) AS plen,
              (o_orderpriority LIKE '%URGENT') AS is_urgent,
              regexp_matches(o_orderpriority, '^[0-9]-') AS has_rank
       FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "string surface: upper/lower/trim/substring/length/like/rlike (§2.6; "
    "upper-casing at the warehouse boundary, add_output.py:305)",
)
def q43(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(1000)
        .select(
            "o_orderkey",
            F.upper("o_orderstatus").alias("up"),
            F.lower("o_orderpriority").alias("lo"),
            F.trim(F.concat(F.lit("  "), F.col("o_orderstatus"), F.lit("  "))).alias("trimmed"),
            F.substring("o_orderpriority", 1, 1).alias("pr1"),
            F.length("o_orderpriority").cast("bigint").alias("plen"),
            F.col("o_orderpriority").like("%URGENT").alias("is_urgent"),
            F.col("o_orderpriority").rlike("^[0-9]-").alias("has_rank"),
        )
    )


@register(
    "q50_outer_joins",
    """SELECT coalesce(n.n_nationkey, s.s_nationkey) AS k,
              count(n.n_name) AS n_nations, count(s.s_suppkey) AS n_suppliers
       FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
       GROUP BY 1 ORDER BY 1""",
    "J1 completion: full outer join with unmatched sides on both ends",
)
def q50(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "full_outer")
        .groupBy(F.coalesce(n.n_nationkey, s.s_nationkey).alias("k"))
        .agg(
            F.count("n_name").alias("n_nations"),
            F.count("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("k")
    )


@register(
    "q51_pivot",
    """SELECT user_id,
              count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
              count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
              count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
       FROM events GROUP BY user_id ORDER BY user_id""",
    "pivot with explicit value list (wide conditional aggregation)",
)
def q51(spark, sf_dir):
    out = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["purchase", "click", "view"])
        .count()
    )
    return (
        out.select(
            "user_id",
            F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
            F.coalesce("click", F.lit(0)).alias("n_click"),
            F.coalesce("view", F.lit(0)).alias("n_view"),
        )
        .orderBy("user_id")
    )


@register(
    "q44_higher_order_arrays",
    """SELECT doc_id,
              CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
                   AS BIGINT) AS total_chars,
              len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
              array_to_string(list_slice(string_split(text, ' '), 1, 3), '-') AS head3
       FROM documents ORDER BY doc_id""",
    "higher-order array functions: transform/filter/aggregate/slice (§2.6 arrays)",
)
def q44(spark, sf_dir):
    ws = F.split("text", " ")
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.aggregate(
                F.transform(ws, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("total_chars"),
            F.size(F.filter(ws, lambda x: F.length(x) > 4)).cast("bigint").alias("n_long"),
            F.array_join(F.slice(ws, 1, 3), "-").alias("head3"),
        )
        .orderBy("doc_id")
    )
