"""Engine facade — the user-facing entry point (SURVEY.md §7 step 1).

Replaces the reference's REST control plane (template JSON mutations,
add_output.py:81-82) with a thin Python API over a SparkSession: register
the driver test tables, run SQL, fetch DataFrames, build CDC pipelines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from snowflake_cdc_spark.session import get_spark

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class Engine:
    """Facade: table registry + SQL + pipeline construction."""

    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark()
        self._registered: dict[str, str] = {}

    # ---- table registry -------------------------------------------------

    def register_parquet(self, name: str, path: str) -> DataFrame:
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        self._registered[name] = path
        return df

    def register_dir(self, sf_dir: str, tables: list[str] | None = None) -> None:
        """Register every driver test table found in ``sf_dir``."""
        for name in tables or TPCH_TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                self.register_parquet(name, path)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
