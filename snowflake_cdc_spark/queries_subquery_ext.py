"""Subquery / advanced-join / sampling coverage Q53-Q71.

Correlated-subquery shapes (EXISTS / NOT EXISTS / scalar-agg / IN-HAVING,
the TPC-H Q4/Q17/Q18 skeletons) expressed Spark-first as semi/anti joins
and broadcast scalar joins; the as-of join custom operator
(operators/asof.py) with a native DuckDB ``ASOF JOIN`` as its independent
oracle; a broadcast band (range) join; exact interpolated percentiles;
the remaining rank window functions; a RANGE-frame running aggregate;
deterministic hash sampling (operators/sampling.py); GROUPING SETS with
grouping() flags; and decimal-exact correlation moments.

Determinism follows queries.py module rules: DECIMAL(18,2) before
aggregation, ROUND(x, 4) on float outputs, identical aliases both sides.
The correlation query computes Pearson r from *exact decimal moments*
(n, Σx, Σy, Σxy, Σx², Σy²) and only converts to double for the final
arithmetic, written token-identically on both sides so IEEE rounding
agrees — a direct ``corr()`` would depend on accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.operators.asof import asof_join
from snowflake_cdc_spark.operators.sampling import hash_sample
from snowflake_cdc_spark.queries import DEC, _t, register

# --------------------------------------------------------------------------
# Correlated subquery shapes (decorrelated to semi/anti/broadcast joins)
# --------------------------------------------------------------------------


@register(
    "q53_exists_semi",
    """SELECT o_orderpriority, count(*) AS n
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_quantity > 45)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "TPC-H Q4 shape: correlated EXISTS -> left-semi join (no dedup pass needed)",
)
def q53(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    hits = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(hits, orders.o_orderkey == hits.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "q54_not_exists_anti",
    """SELECT o_orderpriority, count(*) AS n
       FROM orders
       WHERE NOT EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "correlated NOT EXISTS -> left-anti join",
)
def q54(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    hits = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(hits, orders.o_orderkey == hits.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "q55_scalar_subquery",
    """SELECT count(*) AS n_above
       FROM orders
       WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
             > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)""",
    "scalar-agg subquery (above-global-average), division-free decimal compare; "
    "Spark: broadcast single-row aggregate cross join",
)
def q55(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    scalars = orders.agg(
        F.count("*").alias("_n"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_total"),
    )
    return (
        orders.crossJoin(F.broadcast(scalars))
        .filter(F.col("o_totalprice").cast(DEC) * F.col("_n") > F.col("_total"))
        .agg(F.count("*").alias("n_above"))
    )


@register(
    "q56_having_in",
    """SELECT c_name, o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
       FROM customer JOIN orders ON c_custkey = o_custkey
       WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                            GROUP BY l_orderkey
                            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 180)
       ORDER BY price DESC, o_orderkey LIMIT 20""",
    "TPC-H Q18 shape: IN over a HAVING aggregate -> semi join against the agg",
)
def q56(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .filter(F.col("_sq") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("price"),
        )
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(20)
    )


@register(
    "q57_q17_shape",
    """SELECT ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                  AS small_qty_revenue,
              count(*) AS n
       FROM lineitem l
       JOIN (SELECT l_partkey AS pk,
                    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                    count(*) AS cnt
             FROM lineitem GROUP BY l_partkey) a
         ON l.l_partkey = a.pk
       WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq""",
    "TPC-H Q17 shape: per-part avg-quantity scalar subquery, decorrelated to a "
    "self-join against the grouped aggregate; division-free (q*5*n < Σq ⟺ q < 0.2·avg)",
)
def q57(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity").cast(DEC) * 5 * F.col("cnt") < F.col("sq"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2)
            .alias("small_qty_revenue"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# As-of join and band (range) join
# --------------------------------------------------------------------------


@register(
    "q58_asof_join",
    """SELECT e.event_id, p.event_id AS last_purchase_id
       FROM events e
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON e.user_id = p.user_id AND e.ts > p.ts
       ORDER BY e.event_id""",
    "as-of join (operators/asof.py single-shuffle union-merge); oracle is "
    "DuckDB's native ASOF JOIN — an independent algorithm, not a mirror",
)
def q58(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    return (
        asof_join(
            events,
            purchases,
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            value_cols={"event_id": "last_purchase_id"},
            tie_col="event_id",
            strict=True,
        )
        .select("event_id", "last_purchase_id")
        .orderBy("event_id")
    )


@register(
    "q59_band_join",
    """SELECT t.tier, count(*) AS n,
              ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM orders
       JOIN (VALUES ('low', 0.0, 50000.0),
                    ('mid', 50000.0, 200000.0),
                    ('high', 200000.0, 1e18)) AS t(tier, lo, hi)
         ON o_totalprice >= lo AND o_totalprice < hi
       GROUP BY t.tier ORDER BY t.tier""",
    "band/range join: broadcast nested-loop against a tiny tier table — the "
    "right plan at scale (dim rows ~constant, fact never shuffles for the join)",
)
def q59(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("high", 200000.0, 1e18)],
        "tier string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2)
            .alias("total"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# Percentiles, rank functions, RANGE frames
# --------------------------------------------------------------------------


@register(
    "q60_percentiles",
    """SELECT o_orderpriority,
              ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
              ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
              ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
              ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "exact interpolated percentiles (Spark percentile == DuckDB quantile_cont, "
    "both linear-interpolation type 7); per-group, order-independent",
)
def q60(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    pct = F.percentile(F.col("o_totalprice"), F.lit([0.25, 0.50, 0.75, 0.95]))
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("_p"))
        .select(
            "o_orderpriority",
            F.round(F.col("_p")[0], 4).alias("p25"),
            F.round(F.col("_p")[1], 4).alias("p50"),
            F.round(F.col("_p")[2], 4).alias("p75"),
            F.round(F.col("_p")[3], 4).alias("p95"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q61_rank_fns",
    """SELECT o_orderkey,
              ntile(4)        OVER w AS tile,
              ROUND(percent_rank() OVER w, 4) AS pr,
              ROUND(cume_dist()    OVER w, 4) AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_orderkey""",
    "remaining rank window functions: ntile / percent_rank / cume_dist over a "
    "total (tie-free) per-partition order",
)
def q61(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("tile"),
            F.round(F.percent_rank().over(w), 4).alias("pr"),
            F.round(F.cume_dist().over(w), 4).alias("cd"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q62_range_frame",
    """SELECT event_id, user_id,
              ROUND(CAST(sum(CAST(value AS DECIMAL(18,4)))
                   OVER (PARTITION BY user_id ORDER BY event_id
                         RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
                   AS DOUBLE), 4) AS running_value
       FROM events ORDER BY event_id""",
    "RANGE frame (value-based window bounds, not row counts) with exact "
    "decimal accumulation",
)
def q62(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rangeBetween(-100, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(
                F.sum(F.col("value").cast(T.DecimalType(18, 4))).over(w).cast("double"),
                4,
            ).alias("running_value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Deterministic sampling, grouping sets, exact-moment correlation
# --------------------------------------------------------------------------


@register(
    "q63_hash_sample",
    """SELECT count(*) AS n,
              ROUND(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM orders
       WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '1999'""",
    "deterministic ~10% hash sample (operators/sampling.py): reproducible "
    "across engines/runs/partitionings, pure scan filter (no shuffle)",
)
def q63(spark, sf_dir):
    sampled = hash_sample(
        _t(spark, sf_dir, "orders"), "o_orderkey", 0x1999 / 65536
    )
    return sampled.agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2).alias("total"),
    )


@register(
    "q64_grouping_sets",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS prio,
              grouping(o_orderstatus) AS g_status,
              grouping(o_orderpriority) AS g_prio,
              count(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), ())
       ORDER BY status, prio, g_status, g_prio""",
    "explicit GROUPING SETS with grouping() flags disambiguating real NULL "
    "group values from roll-up rows",
)
def q64(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_q64_orders")
    return spark.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                  coalesce(o_orderpriority, 'ALL') AS prio,
                  grouping(o_orderstatus) AS g_status,
                  grouping(o_orderpriority) AS g_prio,
                  count(*) AS n
           FROM _q64_orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), ())
           ORDER BY status, prio, g_status, g_prio"""
    )


_CORR_EXPR = (
    "round((nd * sxy - sx * sy) / "
    "sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 4)"
)


@register(
    "q65_corr_moments",
    f"""SELECT l_returnflag, {_CORR_EXPR} AS corr_qty_price
        FROM (SELECT l_returnflag,
                     CAST(count(*) AS DOUBLE) AS nd,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                              * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
              FROM lineitem GROUP BY l_returnflag)
        ORDER BY l_returnflag""",
    "Pearson correlation from exact decimal moments: sums are "
    "order-independent decimals, only the final closed-form arithmetic runs "
    "in double (token-identical on both sides, so IEEE rounding agrees); a "
    "direct corr() would be accumulation-order-dependent",
)
def q65(spark, sf_dir):
    q = F.col("l_quantity").cast(DEC)
    p = F.col("l_extendedprice").cast(DEC)
    moments = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("nd"),
            F.sum(q).cast("double").alias("sx"),
            F.sum(p).cast("double").alias("sy"),
            F.sum(q * p).cast("double").alias("sxy"),
            F.sum(q * q).cast("double").alias("sxx"),
            F.sum(p * p).cast("double").alias("syy"),
        )
    )
    return moments.select(
        "l_returnflag", F.expr(_CORR_EXPR).alias("corr_qty_price")
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Generator / array-surface remainder
# --------------------------------------------------------------------------


@register(
    "q66_posexplode",
    r"""SELECT doc_id, pos, sentence
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(text, '\s+(?:the|a)\s+')) AS sentence,
                     unnest(range(len(regexp_split_to_array(text, '\s+(?:the|a)\s+')))) AS pos
              FROM documents)
        WHERE sentence <> '' ORDER BY doc_id, pos""",
    "posexplode (generator with ordinality): stopword-delimited segment split "
    "carrying the position index; DuckDB oracle zips unnest with a range list",
)
def q66(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", r"\s+(?:the|a)\s+")).alias("pos", "sentence"))
        .filter(F.col("sentence") != "")
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "sentence")
        .orderBy("doc_id", "pos")
    )


@register(
    "q67_array_surface",
    """SELECT doc_id,
              len(list_distinct(string_split(text, ' '))) AS n_unique,
              array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',')
                  AS first5
       FROM documents ORDER BY doc_id""",
    "array surface remainder: array_distinct / sort_array / slice / "
    "array_join over tokenized text (binary collation on both engines)",
)
def q67(spark, sf_dir):
    words = F.array_distinct(F.split("text", " "))
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(words).cast("bigint").alias("n_unique"),
            F.array_join(F.slice(F.sort_array(words), 1, 5), ",").alias("first5"),
        )
        .orderBy("doc_id")
    )


@register(
    "q70_stratified_sample",
    """SELECT lang, count(*) AS n
       FROM documents
       WHERE substring(md5(concat(lang, chr(31), CAST(doc_id AS VARCHAR))), 1, 4)
             < CASE lang WHEN 'en' THEN '0ccc'
                         WHEN 'de' THEN '8000'
                         ELSE 'ffff' END
       GROUP BY lang ORDER BY lang""",
    "stratified deterministic sampling (operators/sampling.py): per-language "
    "fractions (5% en, 50% de, 100% rest) with stratum-salted keys — "
    "sampleBy semantics without the seed lottery, reproducible everywhere",
)
def q70(spark, sf_dir):
    from snowflake_cdc_spark.operators.sampling import stratified_hash_sample

    sampled = stratified_hash_sample(
        _t(spark, sf_dir, "documents"),
        key="doc_id",
        strata_col="lang",
        fractions={"en": 0x0CCC / 65536, "de": 0x8000 / 65536},
        default_fraction=1.0,
    )
    return sampled.groupBy("lang").agg(F.count("*").alias("n")).orderBy("lang")


@register(
    "q71_disjunctive_predicates",
    """SELECT count(*) AS n,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity >= 1 AND l_quantity <= 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              AND l_quantity >= 10 AND l_quantity <= 20)
          OR (p_type LIKE 'PROMO%' AND l_quantity > 45)""",
    "TPC-H Q19 shape: OR-of-ANDs across both join sides — exercises CNF "
    "conversion: the optimizer must derive the per-table residuals it can "
    "push below the join from a predicate it cannot fully push",
)
def q71(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (F.col("p_type").like("PROMO%") & (F.col("l_quantity") > 45))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2)
            .alias("total"),
        )
    )


@register(
    "q72_q15_shape",
    """WITH rev AS (SELECT l_suppkey AS sk,
                           sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l_discount AS DECIMAL(18,2))) AS total
                    FROM lineitem GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, ROUND(CAST(total AS DOUBLE), 4) AS total_rev
       FROM supplier JOIN rev ON s_suppkey = sk
       WHERE total = (SELECT max(total) FROM rev)
       ORDER BY s_suppkey""",
    "TPC-H Q15 shape: argmax against a reused grouped view — the view is "
    "computed once and its scalar max broadcasts back over it (decimal-exact "
    "so the equality is well-defined)",
)
def q72(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).alias("total")
        )
    )
    top = rev.agg(F.max("total").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total") == F.col("_mx"))
        .join(F.broadcast(sup), F.col("sk") == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total").cast("double"), 4).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q73_q22_shape",
    """SELECT substring(c_name, 1, 1) AS cc, count(*) AS n,
              ROUND(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totbal
       FROM customer
       WHERE CAST(c_acctbal AS DECIMAL(18,2))
                 * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
             > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
                FROM customer WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 300000)
       GROUP BY cc ORDER BY cc""",
    "TPC-H Q22 shape: above-average-balance customers with no large orders — "
    "scalar-agg compare (division-free) fused with an anti join",
)
def q73(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    scalars = pos.agg(
        F.count("*").alias("_n"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("_total"),
    )
    return (
        cust.crossJoin(F.broadcast(scalars))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("_n") > F.col("_total"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 1, 1).alias("cc"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2)
            .alias("totbal"),
        )
        .orderBy("cc")
    )
