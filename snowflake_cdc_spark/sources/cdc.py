"""CDC event envelope + deterministic change-log fixture.

Envelope shape per the reference (README.md:20-31, SURVEY.md §1.1): one
nested record per INSERT/UPDATE/DELETE with ``data.row`` (after-image),
``data.old_row`` (before-image), ``data.metadata.is_delete``,
``data.primary_key``, ``data.database_name`` / ``data.table_name`` /
``data.full_table_name``, plus a total-order ``seq`` (binlog position
stand-in).

The fixture is synthesized deterministically from the driver's ``orders``
table (FIXTURES.md §B) — identical recipe implemented twice: here as a
DataFrame program, and as a DuckDB CTE (``CDC_EVENTS_SQL``) so the oracle
sees byte-identical input:

- every order → ``insert`` (seq = o_orderkey)
- o_orderkey % 3 = 0 → ``update`` bumping o_totalprice by +10.00
  (seq = max_key + o_orderkey; old_row = original)
- o_orderkey % 7 = 0 → ``delete`` (seq = 2*max_key + o_orderkey;
  row NULL, old_row = latest state)
- table_name alternates ``orders_part_0/1`` by o_orderkey % 2 —
  exercises the ``_part_\\d+$`` shard-merge of README.md:29-31.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Nested envelope StructType for a given per-table payload schema
    (SURVEY.md §1.1 / FIXTURES.md §B nested variant)."""
    return T.StructType(
        [
            T.StructField(
                "data",
                T.StructType(
                    [
                        T.StructField("database_name", T.StringType()),
                        T.StructField("table_name", T.StringType()),
                        T.StructField("full_table_name", T.StringType()),
                        T.StructField("primary_key", T.StringType()),
                        T.StructField("row", row_schema),
                        T.StructField("old_row", row_schema),
                        T.StructField(
                            "metadata",
                            T.StructType([T.StructField("is_delete", T.BooleanType())]),
                        ),
                    ]
                ),
            ),
            T.StructField("seq", T.LongType()),
        ]
    )


def _common_cols(orders: DataFrame, op: str) -> DataFrame:
    key = F.col("o_orderkey")
    table_name = F.concat(F.lit("orders_part_"), (key % 2).cast("string"))
    return (
        orders.withColumn("database_name", F.lit("tpch"))
        .withColumn("table_name", table_name)
        .withColumn("full_table_name", F.concat_ws(".", F.col("database_name"), F.col("table_name")))
        .withColumn("op", F.lit(op))
        .withColumn("is_delete", F.lit(op == "delete"))
        .withColumn("primary_key", key.cast("string"))
    )


def cdc_events_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-form change log derived from ``{sf_dir}/orders.parquet``
    (FIXTURES.md §B flat variant): columns seq, database_name, table_name,
    full_table_name, op, is_delete, primary_key, row_*, old_row_*.

    The max-key scalar is joined in via a broadcast cross join (scalar
    aggregate → 1-row broadcast), keeping the whole derivation a single
    distributed plan — no driver-side collect.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*ORDER_COLS)
    mx = orders.agg(F.max("o_orderkey").alias("__max_key"))
    base = orders.crossJoin(F.broadcast(mx))

    def row_cols(src: DataFrame, bump: bool) -> list:
        cols = []
        for c in ORDER_COLS:
            e = F.col(c)
            if bump and c == "o_totalprice":
                e = e + F.lit(10.0)
            cols.append(e.alias(f"row_{c}"))
        return cols

    def null_cols(prefix: str, orders_schema: T.StructType) -> list:
        return [
            F.lit(None).cast(orders_schema[c].dataType).alias(f"{prefix}{c}")
            for c in ORDER_COLS
        ]

    sch = orders.schema
    meta = ["database_name", "table_name", "full_table_name", "op", "is_delete", "primary_key"]

    inserts = _common_cols(base, "insert").select(
        F.col("o_orderkey").alias("seq"), *[F.col(c) for c in meta],
        *row_cols(base, bump=False), *null_cols("old_row_", sch),
    )
    upd_base = _common_cols(base.filter(F.col("o_orderkey") % 3 == 0), "update")
    updates = upd_base.select(
        (F.col("__max_key") + F.col("o_orderkey")).alias("seq"), *[F.col(c) for c in meta],
        *row_cols(upd_base, bump=True),
        *[F.col(c).alias(f"old_row_{c}") for c in ORDER_COLS],
    )
    del_base = _common_cols(base.filter(F.col("o_orderkey") % 7 == 0), "delete")
    latest_price = F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 10.0).otherwise(
        F.col("o_totalprice")
    )
    deletes = del_base.select(
        (F.lit(2) * F.col("__max_key") + F.col("o_orderkey")).alias("seq"),
        *[F.col(c) for c in meta],
        *null_cols("row_", sch),
        *[
            (latest_price if c == "o_totalprice" else F.col(c)).alias(f"old_row_{c}")
            for c in ORDER_COLS
        ],
    )
    return inserts.unionByName(updates).unionByName(deletes)


def cdc_events_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope-shaped variant of the same fixture (FIXTURES.md §B nested):
    struct<data: struct<..., row, old_row, metadata>, seq>."""
    flat = cdc_events_flat(spark, sf_dir)
    row_struct = F.when(
        F.col("op") != "delete",
        F.struct(*[F.col(f"row_{c}").alias(c) for c in ORDER_COLS]),
    )
    old_struct = F.when(
        F.col("op") != "insert",
        F.struct(*[F.col(f"old_row_{c}").alias(c) for c in ORDER_COLS]),
    )
    return flat.select(
        F.struct(
            F.col("database_name"),
            F.col("table_name"),
            F.col("full_table_name"),
            F.col("primary_key"),
            row_struct.alias("row"),
            old_struct.alias("old_row"),
            F.struct(F.col("is_delete").alias("is_delete")).alias("metadata"),
        ).alias("data"),
        F.col("seq"),
    )


# DuckDB CTE producing the identical flat fixture from the pre-registered
# ``orders`` view — prepended to Q5-Q8 oracle SQL. The +10.0 bump and the
# modulo selections are integer-exact, so Spark and DuckDB agree bit-for-bit.
CDC_EVENTS_SQL = """
WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
cdc_events AS (
  SELECT o_orderkey AS seq,
         'tpch' AS database_name,
         'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR) AS table_name,
         'tpch' || '.' || 'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR) AS full_table_name,
         'insert' AS op, FALSE AS is_delete,
         CAST(o_orderkey AS VARCHAR) AS primary_key,
         o_orderkey AS row_o_orderkey, o_custkey AS row_o_custkey,
         o_orderstatus AS row_o_orderstatus, o_totalprice AS row_o_totalprice,
         o_orderdate AS row_o_orderdate, o_orderpriority AS row_o_orderpriority,
         CAST(NULL AS BIGINT) AS old_row_o_orderkey, CAST(NULL AS BIGINT) AS old_row_o_custkey,
         CAST(NULL AS VARCHAR) AS old_row_o_orderstatus, CAST(NULL AS DOUBLE) AS old_row_o_totalprice,
         CAST(NULL AS TIMESTAMP) AS old_row_o_orderdate, CAST(NULL AS VARCHAR) AS old_row_o_orderpriority
  FROM orders
  UNION ALL
  SELECT mx.m + o_orderkey AS seq,
         'tpch', 'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR),
         'tpch' || '.' || 'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR),
         'update', FALSE, CAST(o_orderkey AS VARCHAR),
         o_orderkey, o_custkey, o_orderstatus, o_totalprice + 10.0,
         o_orderdate, o_orderpriority,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders, mx WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT 2 * mx.m + o_orderkey AS seq,
         'tpch', 'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR),
         'tpch' || '.' || 'orders_part_' || CAST(o_orderkey % 2 AS VARCHAR),
         'delete', TRUE, CAST(o_orderkey AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(NULL AS DOUBLE), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR),
         o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 10.0 ELSE 0.0 END,
         o_orderdate, o_orderpriority
  FROM orders, mx WHERE o_orderkey % 7 = 0
)
"""
