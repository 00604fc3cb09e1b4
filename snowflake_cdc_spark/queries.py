"""Declared correctness queries Q1-Q24 (SURVEY.md §2.9) — the t2 oracle
surface.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL the DuckDB oracle runs over the same parquet
files. Determinism rules (SURVEY.md §2.9): monetary aggregates go through
DECIMAL(18,2) *before* summation (order-independent exact arithmetic);
float outputs are ROUND(x, 4); vector math casts float elements to double
before multiplying so both engines accumulate the same IEEE values.

Column names are aliased identically on both sides — the driver sorts
columns by name and hash-compares values.

Timestamp outputs are cast to TIMESTAMP_NTZ on the Spark side: the driver
tables hold naive parquet timestamps, which DuckDB reads naively while
Spark reads as session-local (UTC here); NTZ makes the Arrow types and
epoch values identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.functions.strings import actual_full_table_name
from snowflake_cdc_spark.operators.filters import filter_table
from snowflake_cdc_spark.operators.flatten import flatten_columns
from snowflake_cdc_spark.operators.similarity import cosine_topk
from snowflake_cdc_spark.operators.stats import first_last_seen, value_distribution
from snowflake_cdc_spark.operators.upsert import (
    snapshot_hard_delete,
    snapshot_logical_delete,
)
from snowflake_cdc_spark.sources.cdc import (
    CDC_EVENTS_SQL,
    ORDER_COLS,
    cdc_events_flat,
    cdc_events_nested,
)
from snowflake_cdc_spark.sources.io import read_table

DEC = T.DecimalType(18, 2)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP (LTZ) output column to TIMESTAMP_NTZ (see
    module docstring). Identity on values under the UTC session tz."""
    cols = [
        F.col(f.name).cast(T.TimestampNTZType()).alias(f.name)
        if isinstance(f.dataType, T.TimestampType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(cols)


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


# --------------------------------------------------------------------------
# Q1/Q2 — P1 equality filter (EqualToFilterV2, add_output.py:366-406)
# --------------------------------------------------------------------------


@register(
    "q01_filter_eq",
    "SELECT event_id, event_type FROM events WHERE event_type = 'purchase' ORDER BY event_id",
    "P1 equality filter, pushed to the parquet scan",
)
def q01(spark, sf_dir):
    return (
        filter_table(_t(spark, sf_dir, "events"), "purchase", field="event_type")
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


@register(
    "q02_filter_inverted",
    "SELECT count(*) AS n FROM events WHERE event_type <> 'purchase'",
    "P1 inverted filter (filterParameters.inverted, add_output.py:394)",
)
def q02(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") != "purchase")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Q3/Q4 — scalar functions and casts (P6/P7/P8)
# --------------------------------------------------------------------------


@register(
    "q03_string_fns",
    r"""SELECT o_orderkey,
               regexp_replace(o_orderpriority, '\d-', '', 'g') AS pr,
               concat(o_orderstatus, '.', o_orderpriority) AS tag
        FROM orders ORDER BY o_orderkey""",
    "P6 STRING_FORMAT / P7 REGEXP_REPLACE (README.md:31)",
)
def q03(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.regexp_replace("o_orderpriority", r"\d-", "").alias("pr"),
            F.concat_ws(".", "o_orderstatus", "o_orderpriority").alias("tag"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q04_cast",
    """SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q, CAST(l_shipdate AS DATE) AS d
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "P8 type coercion (udt_map semantics, add_output.py:43-57)",
)
def q04(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber")
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("bigint").alias("q"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
    )


# --------------------------------------------------------------------------
# Q5-Q8 — CDC envelope: flatten, calculated field, upsert snapshots
# --------------------------------------------------------------------------

_ROW_COLS_SQL = ", ".join(
    [f"row_{c}" for c in ORDER_COLS] + [f"old_row_{c}" for c in ORDER_COLS]
)


@register(
    "q05_flatten_prefix",
    CDC_EVENTS_SQL
    + f"""SELECT primary_key, seq, is_delete, {_ROW_COLS_SQL}
         FROM cdc_events WHERE full_table_name = 'tpch.orders_part_0'
         ORDER BY primary_key, seq""",
    "P2/P11 star-expansion with row_/old_row_ prefixes over the nested envelope (README.md:34)",
)
def q05(spark, sf_dir):
    nested = cdc_events_nested(spark, sf_dir)
    filtered = filter_table(nested, "tpch.orders_part_0")
    row_schema = nested.schema["data"].dataType["row"].dataType
    cols = [
        F.col("data.primary_key").alias("primary_key"),
        F.col("seq"),
        F.col("data.metadata.is_delete").alias("is_delete"),
    ]
    cols += flatten_columns(row_schema, "data.row.", "row_")
    cols += flatten_columns(row_schema, "data.old_row.", "old_row_")
    return ntz(filtered.select(cols).orderBy("primary_key", "seq"))


@register(
    "q06_calculated_field",
    CDC_EVENTS_SQL
    + r"""SELECT DISTINCT database_name || '.' || regexp_replace(table_name, '_part_\d+$', '', 'g')
             AS actual_full_table_name
         FROM cdc_events ORDER BY 1""",
    "P5 calculated field: actual_full_table_name shard re-merge (README.md:29-31)",
)
def q06(spark, sf_dir):
    return (
        cdc_events_flat(spark, sf_dir)
        .select(actual_full_table_name().alias("actual_full_table_name"))
        .distinct()
        .orderBy("actual_full_table_name")
    )


_SNAPSHOT_COLS_SQL = ", ".join([f"row_{c}" for c in ORDER_COLS])


@register(
    "q07_upsert_hard_delete",
    CDC_EVENTS_SQL
    + f""", latest AS (
        SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY seq DESC) AS rn
        FROM cdc_events)
       SELECT primary_key, seq, {_SNAPSHOT_COLS_SQL}
       FROM latest WHERE rn = 1 AND NOT is_delete ORDER BY primary_key""",
    "K1-K4 flagship: latest-by-key materialization, hard delete (SetIsDelete, add_output.py:143-150)",
)
def q07(spark, sf_dir):
    snap = snapshot_hard_delete(cdc_events_flat(spark, sf_dir), ["primary_key"])
    return ntz(
        snap.select("primary_key", "seq", *[f"row_{c}" for c in ORDER_COLS]).orderBy(
            "primary_key"
        )
    )


@register(
    "q08_upsert_logical_delete",
    CDC_EVENTS_SQL
    + f""", latest AS (
        SELECT *, row_number() OVER (PARTITION BY primary_key ORDER BY seq DESC) AS rn
        FROM cdc_events)
       SELECT primary_key, seq, {_SNAPSHOT_COLS_SQL}, is_delete AS is_deleted
       FROM latest WHERE rn = 1 ORDER BY primary_key""",
    "K5 logical delete: delete marker becomes a boolean column (add_output.py:139-141)",
)
def q08(spark, sf_dir):
    snap = snapshot_logical_delete(cdc_events_flat(spark, sf_dir), ["primary_key"])
    return ntz(
        snap.select(
            "primary_key", "seq", *[f"row_{c}" for c in ORDER_COLS], "is_deleted"
        ).orderBy("primary_key")
    )


# --------------------------------------------------------------------------
# Q9/Q10 — inspection aggregations (A1/A2)
# --------------------------------------------------------------------------


@register(
    "q09_distribution",
    """SELECT event_type, count(*) AS n FROM events
       GROUP BY event_type ORDER BY n DESC, event_type""",
    "A1 value distribution (add_output.py:524-534)",
)
def q09(spark, sf_dir):
    dist = value_distribution(_t(spark, sf_dir, "events"), "event_type")
    return dist.withColumnRenamed("count", "n")


@register(
    "q10_first_last_seen",
    """SELECT date_trunc('second', min(ts)) AS first_seen,
              date_trunc('second', max(ts)) AS last_seen
       FROM events WHERE value IS NOT NULL""",
    "A2 first/last-seen per field (add_output.py:264-274)",
)
def q10(spark, sf_dir):
    agg = first_last_seen(_t(spark, sf_dir, "events"), "value")
    return ntz(
        agg.select(
            F.date_trunc("second", "first_seen").alias("first_seen"),
            F.date_trunc("second", "last_seen").alias("last_seen"),
        )
    )


# --------------------------------------------------------------------------
# Q11/Q12 — grouped aggregation + multi-join (A4, J1)
# --------------------------------------------------------------------------


@register(
    "q11_grouped_agg",
    """SELECT l_returnflag, l_linestatus,
              ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    "A4 grouped aggregation (TPC-H Q1 skeleton; groupBy capability, add_output.py:117). "
    "Summation stays DECIMAL (order-independent, exact); the FINAL projection is "
    "ROUND(CAST(.. AS DOUBLE), 2) on both engines because the driver's hash "
    "canonicalizer renders Spark and DuckDB DECIMALs differently (r1: q11/q12/q45/"
    "q46/q48 hash-failed with bit-identical Decimal values).",
)
def q11(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q12_multi_join",
    """SELECT c_mktsegment,
              ROUND(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS rev
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "J1 multi-way equi-join; customer is broadcast, lineitem⋈orders shuffles on orderkey. "
    "Sum stays DECIMAL internally (2dp×2dp products are exactly 4dp — no rounding "
    "anywhere in the aggregation); only the final projection is double-cast, ROUND(..,4), "
    "because the driver hash-canonicalizes Spark and DuckDB DECIMALs differently.",
)
def q12(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("rev"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q13/Q14 — anti / semi joins (J2)
# --------------------------------------------------------------------------


@register(
    "q13_anti_join",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
       ORDER BY c_custkey""",
    "J2 left-anti join (the set-exclusion of add_output.py:546-547 at scale)",
)
def q13(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q14_semi_join",
    """SELECT p_partkey FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
       ORDER BY p_partkey""",
    "J2 left-semi join",
)
def q14(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Q15-Q17 — window functions (W1/W2/W3)
# --------------------------------------------------------------------------


@register(
    "q15_topk_per_group",
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
         SELECT o_orderpriority, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t
       WHERE rn <= 3 ORDER BY o_orderpriority, rn""",
    "W1 ranking window: top-3 orders by price per priority",
)
def q15(spark, sf_dir):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "q16_lag",
    """SELECT user_id, event_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS prev_event_type
       FROM events ORDER BY user_id, event_id""",
    "W2 analytic window: previous event per user (lag reconstructs old_row-style history)",
)
def q16(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_event_type"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q17_running_frame",
    """SELECT user_id, event_id,
              count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS running_n
       FROM events ORDER BY user_id, event_id""",
    "W3 frame aggregate: running count per user",
)
def q17(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.count(F.lit(1)).over(w).alias("running_n"))
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# Q18/Q19 — sort/limit, set ops (O1, U1/U2)
# --------------------------------------------------------------------------


@register(
    "q18_sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "O1 global top-k: per-partition top-k then single-reduce (TakeOrderedAndProject)",
)
def q18(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@register(
    "q19_intersect",
    """SELECT n_nationkey AS k FROM nation
       INTERSECT
       SELECT c_nationkey FROM customer ORDER BY k""",
    "U2 intersect",
)
def q19a(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    return nation.intersect(cust).orderBy("k")


@register(
    "q19_except",
    """SELECT n_nationkey AS k FROM nation
       EXCEPT
       SELECT c_nationkey FROM customer ORDER BY k""",
    "U2 except",
)
def q19b(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    return nation.exceptAll(cust).distinct().orderBy("k")


@register(
    "q13b_anti_join_nonempty",
    """SELECT o_orderkey FROM orders
       WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
       ORDER BY o_orderkey""",
    "J2 left-anti join with a non-degenerate (non-empty) result: orders with no lineitems",
)
def q13b(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "q19_except_nonempty",
    """SELECT o_orderkey AS k FROM orders
       EXCEPT
       SELECT l_orderkey FROM lineitem ORDER BY k""",
    "U2 except with a non-empty result",
)
def q19c(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return orders.exceptAll(li).distinct().orderBy("k")


# --------------------------------------------------------------------------
# Q20/Q21 — JSON + date functions
# --------------------------------------------------------------------------


@register(
    "q20_json",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events ORDER BY event_id""",
    "JSON accessors over string-typed json columns (json→string, add_output.py:50-51)",
)
def q20(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .orderBy("event_id")
    )


@register(
    "q21_date_trunc",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
       FROM events GROUP BY 1 ORDER BY 1""",
    "date_trunc bucketing (temporal surface, SURVEY.md §2.6)",
)
def q21(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# Q22-Q24 — north-star operators (N1/N3/N5)
# --------------------------------------------------------------------------


@register(
    "q22_exact_dedup",
    "SELECT count(DISTINCT lang || '|' || source) AS n FROM documents",
    "N1 exact dedup cardinality over composite identity",
)
def q22(spark, sf_dir):
    return _t(spark, sf_dir, "documents").agg(
        F.count_distinct(F.concat_ws("|", "lang", "source")).alias("n")
    )


@register(
    "q23_cosine_topk",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       SELECT e.vec_id,
              ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(q.qe AS DOUBLE[])))), 4) AS sim
       FROM embeddings e, q
       WHERE e.vec_id <> 0
       ORDER BY sim DESC, e.vec_id LIMIT 5""",
    "N3 similarity search: exact top-5 cosine neighbors of vec_id=0",
)
def q23(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select("vec_id", "sim").orderBy(F.desc("sim"), "vec_id")


@register(
    "q24_token_count",
    """SELECT doc_id, length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
       FROM documents ORDER BY doc_id""",
    "N5 text analysis: whitespace token count",
)
def q24(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (
                F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# public accessors (consumed by __spark_entry__.py and tests)
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_extended()
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_extended()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def _load_extended() -> None:
    """Register the north-star + extended-relational query families
    (defined in sibling modules to keep this file navigable; imported
    lazily to avoid a cycle)."""
    import snowflake_cdc_spark.queries_analytic_ext  # noqa: F401
    import snowflake_cdc_spark.queries_behavior_ext  # noqa: F401
    import snowflake_cdc_spark.queries_northstar  # noqa: F401
    import snowflake_cdc_spark.queries_relational_ext  # noqa: F401
    import snowflake_cdc_spark.queries_subquery_ext  # noqa: F401
    import snowflake_cdc_spark.queries_functions_ext  # noqa: F401
    import snowflake_cdc_spark.queries_surface_ext  # noqa: F401
    import snowflake_cdc_spark.queries_tpch_ext  # noqa: F401
    import snowflake_cdc_spark.queries_tpch_ext2  # noqa: F401
    import snowflake_cdc_spark.queries_curation_ext  # noqa: F401
    import snowflake_cdc_spark.queries_pipeline_ext  # noqa: F401
    import snowflake_cdc_spark.queries_modern_ext  # noqa: F401
    import snowflake_cdc_spark.queries_governance_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round5_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round5b_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round6_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round7_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round8_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round9_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round10_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round11_ext  # noqa: F401
    import snowflake_cdc_spark.queries_round11b_ext  # noqa: F401
