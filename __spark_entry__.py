"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q7: CDC latest-by-key upsert
snapshot with hard deletes — the reference's core semantic) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle; both are defined in
``snowflake_cdc_spark.queries`` and re-exported here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_cdc_spark import queries as _q

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.REGISTRY["q07_upsert_hard_delete"].spark_fn(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
