"""TPC-H-shaped coverage extension q74-q81 (SURVEY.md §2.5, A4/J1/J2):
the remaining classic analytic shapes the earlier rounds had not declared —
returned-item report (Q10), priority-bucket conditional counts over a join
(Q12), outer-join count distribution (Q13), promo-revenue ratio (Q14),
two-nation volume shipping (Q7), market-share ratio (Q8), nested
aggregate-threshold semi join (Q20), and strict-last-shipper
EXISTS/NOT-EXISTS self joins (Q21).

The driver testdata lacks partsupp / l_shipmode / l_commitdate /
l_receiptdate, so the Q12/Q20/Q21 shapes are adapted to the available
columns while keeping the *plan* shape that matters at scale (the join
topology, correlation structure, and aggregation layering).

Determinism follows queries.py: money goes through DECIMAL(18,2) before
summation, 2dp×2dp products keep scale 4, ratios are computed in double
only after exact decimal sums, floats rounded to 4dp, years cast BIGINT.

Scale notes: every dimension side (nation, region, supplier, part,
filtered customer) is broadcast so the only shuffles are the fact-table
aggregations; the Q21 shape keeps the equi-key (l_orderkey) in the
semi/anti conditions so Spark plans shuffled hash joins, not nested
loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.queries import DEC, _t, register

DEC4 = T.DecimalType(18, 4)


def _rev(df):
    """Exact revenue term: DECIMAL(18,2) price × DECIMAL(18,2) (1-disc)."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)


@register(
    "q74_q10_shape",
    """SELECT c_custkey, c_name, n_name,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation   ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate <  TIMESTAMP '1997-04-01'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "TPC-H Q10 shape: returned-item report — date-windowed fact join, "
    "broadcast dims, top-20 by exact decimal revenue",
)
def q74(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev(li)).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q75_q12_shape",
    """SELECT l_linestatus,
              count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 END) AS high_line_count,
              count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 END) AS low_line_count
       FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate <  TIMESTAMP '1998-01-01'
       GROUP BY l_linestatus ORDER BY l_linestatus""",
    "TPC-H Q12 shape (adapted: priority buckets for shipmode): "
    "fact-fact equi join + conditional counts",
)
def q75(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q76_q13_shape",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT OUTER JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             GROUP BY c_custkey)
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "TPC-H Q13 shape: outer join preserving customers with zero orders, "
    "then a distribution over the per-customer counts (agg of agg)",
)
def q76(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q77_q14_shape",
    """SELECT ROUND(100.0
                * CAST(sum(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                     * CAST(1 - l_discount AS DECIMAL(18,2))
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE),
              4) AS promo_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-06-01'
         AND l_shipdate <  TIMESTAMP '1997-07-01'""",
    "TPC-H Q14 shape: promo-revenue ratio — exact decimal sums, "
    "double division only at the boundary",
)
def q77(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = _t(spark, sf_dir, "part")
    rev = _rev(li)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC4))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_revenue")
        )
    )


@register(
    "q78_q7_shape",
    """SELECT supp_nation, cust_nation, l_year,
              ROUND(CAST(sum(volume) AS DOUBLE), 4) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                    CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
             FROM supplier, lineitem, orders, customer, nation n1, nation n2
             WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
               AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
               AND c_nationkey = n2.n_nationkey
               AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31')
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
    "TPC-H Q7 shape: two-nation volume shipping — disjunctive nation-pair "
    "predicate, per-year exact revenue; both nation maps broadcast",
)
def q78(spark, sf_dir):
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.n1_key)
        .join(F.broadcast(n2), cust.c_nationkey == n2.n2_key)
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _rev(li).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume").cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q79_q8_shape",
    """SELECT o_year,
              ROUND(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                    / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
       FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                    CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume,
                    n2.n_name AS nation
             FROM part, lineitem, supplier, orders, customer,
                  nation n1, nation n2, region
             WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
               AND l_orderkey = o_orderkey AND o_custkey = c_custkey
               AND c_nationkey = n1.n_nationkey
               AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
               AND s_nationkey = n2.n_nationkey
               AND p_type = 'PROMO')
       GROUP BY o_year ORDER BY o_year""",
    "TPC-H Q8 shape: supplier-nation market share inside one customer "
    "region per year — 8-relation join, ratio at the double boundary",
)
def q79(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    share_num = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast(DEC4)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n1_key)
        .join(F.broadcast(region), n1.n1_region == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.n2_key)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev(li).alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                share_num.cast("double") / F.sum("volume").cast("double"), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q80_q20_shape",
    """SELECT s_name, ROUND(CAST(qty AS DOUBLE), 2) AS widget_qty
       FROM supplier
       JOIN (SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
             FROM lineitem JOIN part ON p_partkey = l_partkey
             WHERE p_name LIKE '%widget%'
             GROUP BY l_suppkey) shipped
         ON s_suppkey = l_suppkey
       WHERE CAST(qty AS DOUBLE) >
             (SELECT avg(CAST(qty AS DOUBLE)) FROM
                (SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
                 FROM lineitem JOIN part ON p_partkey = l_partkey
                 WHERE p_name LIKE '%widget%'
                 GROUP BY l_suppkey))
       ORDER BY s_name""",
    "TPC-H Q20 shape (adapted to lineitem-as-partsupp): nested aggregate "
    "threshold — per-supplier shipped quantity vs the global average, "
    "semi-joined back to supplier",
)
def q80(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    # The grouped view is tiny (one row per supplier) — compute it once,
    # derive the scalar threshold from it, and broadcast-join the
    # single-row aggregate rather than re-scanning lineitem.
    shipped = shipped.persist()
    threshold = shipped.agg(
        F.avg(F.col("qty").cast("double")).alias("thr")
    )
    return (
        shipped.join(F.broadcast(threshold))
        .filter(F.col("qty").cast("double") > F.col("thr"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", F.round(F.col("qty").cast("double"), 2).alias("widget_qty"))
        .orderBy("s_name")
    )


@register(
    "q81_q21_shape",
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate >= l1.l_shipdate)
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "TPC-H Q21 shape (adapted: strict-last shipper for receipt>commit): "
    "correlated EXISTS + NOT-EXISTS self joins on the fact table, planned "
    "as equi-keyed semi/anti joins (no nested loop)",
)
def q81(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waited = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
            & (F.col("l3.l_shipdate") >= F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        waited.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
