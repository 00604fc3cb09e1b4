"""TPC-H-shaped coverage q103-q107 — the last five classic shapes
(Q2, Q5, Q9, Q11, Q16), completing all 22 TPC-H query topologies in the
declared surface (SURVEY.md §2.5 A4/J1/J2, subquery shapes).

The driver testdata has no ``partsupp`` table, so these shapes derive a
part-supplier relation from ``lineitem``: ``ps(partkey, suppkey)`` pairs
(~52k at sf0.01) with ``min(l_extendedprice)`` standing in for
``ps_supplycost`` and ``sum(l_extendedprice)`` for stock value. The
*plan* shape that matters at scale is preserved in every case: Q2's
correlated-min decorrelated into a single-shuffle window min, Q5's
six-relation join with the supplier-nation = customer-nation locality
predicate, Q9's profit expression over a five-way join, Q11's
group-vs-global-scalar HAVING, Q16's NOT-IN anti join + count distinct.

Determinism: money sums go through DECIMAL(18,2) before aggregation;
2dp×2dp products keep scale 4; the Q11 threshold compare is decimal ×
integer (value*500 > total) so the boundary is exact — never a double
fraction of a decimal. Years cast BIGINT.

Scale notes: nation/region/supplier/part are all broadcast (≤2k rows at
any SF ratio — dims scale far slower than facts); the only wide
shuffles are the lineitem aggregations and the ps derivation, each a
single hash shuffle on its group key. Q2's per-part min uses a window
over the already-region-filtered ps, one shuffle on partkey, instead of
a groupBy + re-join (two shuffles).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.queries import DEC, _t, register

DEC4 = T.DecimalType(18, 4)


def _rev(df=None):
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)


@register(
    "q103_q2_shape",
    """WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                          min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
                   FROM lineitem GROUP BY 1, 2),
       eps AS (SELECT ps_partkey, ps_suppkey, ps_supplycost,
                      s_acctbal, s_name, n_name
               FROM ps JOIN supplier ON s_suppkey = ps_suppkey
                       JOIN nation   ON s_nationkey = n_nationkey
                       JOIN region   ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE')
       SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
              ROUND(CAST(ps_supplycost AS DOUBLE), 2) AS ps_supplycost
       FROM eps JOIN part ON p_partkey = ps_partkey
       WHERE p_size <= 15 AND p_type = 'LARGE'
         AND ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eps e2
                              WHERE e2.ps_partkey = eps.ps_partkey)
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "TPC-H Q2 shape: cheapest-supplier-per-part in a region. The "
    "correlated min subquery is decorrelated into a window min over the "
    "region-filtered part-supplier relation (one shuffle on partkey); "
    "supplier/nation/region/part all broadcast",
)
def q103(spark, sf_dir):
    ps = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("ps_supplycost"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    eps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eps.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.round(F.col("ps_supplycost").cast("double"), 2).alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q104_q5_shape",
    """SELECT n_name,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate <  TIMESTAMP '1997-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "TPC-H Q5 shape: local-supplier volume — six-relation join whose "
    "locality predicate (customer nation = supplier nation) joins two "
    "fact-side foreign keys; dims broadcast, one agg shuffle",
)
def q104(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q105_q9_shape",
    """SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(18,2))
                       - CAST(p_retailprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS profit
       FROM lineitem
       JOIN part     ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders   ON o_orderkey = l_orderkey
       JOIN nation   ON n_nationkey = s_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""",
    "TPC-H Q9 shape: product-type profit by supplier nation and year "
    "(retailprice*qty stands in for supplycost*qty — no partsupp in the "
    "testdata). Five-way join, part filter pushed to the broadcast side, "
    "exact scale-4 decimal profit",
)
def q105(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = _rev() - F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


@register(
    "q106_q11_shape",
    """WITH val AS (SELECT l_partkey AS ps_partkey,
                          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS value
                   FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                   WHERE s_nationkey = 7
                   GROUP BY l_partkey)
       SELECT ps_partkey, ROUND(CAST(value AS DOUBLE), 2) AS value FROM val
       WHERE value * 500 > (SELECT CAST(sum(value) AS DECIMAL(18,2)) FROM val)
       ORDER BY value DESC, ps_partkey""",
    "TPC-H Q11 shape: important-stock — per-part value vs a global "
    "scalar threshold. The compare is decimal*integer vs exact decimal "
    "total (never a double fraction), so the boundary is engine-exact; "
    "the scalar aggregate broadcasts as a single-row cross join",
)
def q106(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).alias("value"))
    )
    total = val.agg(F.sum("value").cast(DEC).alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") * F.lit(500) > F.col("total"))
        .select(
            "ps_partkey", F.round(F.col("value").cast("double"), 2).alias("value")
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q107_q16_shape",
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#1'
         AND p_type NOT IN ('PROMO', 'ECONOMY')
         AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "TPC-H Q16 shape: supplier diversity per part group — distinct "
    "part-supplier pairs, NOT-IN excluded suppliers (negative balance "
    "stands in for complaints) as a broadcast anti join, then "
    "count-distinct over the part attributes",
)
def q107(spark, sf_dir):
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
