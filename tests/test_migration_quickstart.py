"""Executable contract for MIGRATION.md: the guide's quickstart path —
columns CSV → Catalog → PipelineSpec → CdcPipeline.start_stream — must
run verbatim-shaped and materialize the correct snapshot. Guards the
migration guide against API drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.catalog import Catalog
from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
from tests.conftest import SF_SMOKE

COLUMNS_CSV = (
    "tpch.orders,o_orderkey,bigint,true\n"
    "tpch.orders,o_orderpriority,varchar,false\n"
    "tpch.orders,o_totalprice,double,false\n"
)


def test_migration_guide_quickstart(spark, tmp_path):
    raw_path = str(tmp_path / "raw")
    cdc_events_nested(spark, SF_SMOKE).coalesce(2).write.parquet(raw_path)

    # --- the MIGRATION.md "one table" recipe, line for line -------------
    catalog = Catalog.from_columns_csv(COLUMNS_CSV)
    spec = PipelineSpec(
        full_table_name="tpch.orders",
        key_columns=catalog.get("tpch.orders").primary_key_columns,
        use_synthetic_key=False,
        delete_strategy=DeleteStrategy.LOGICAL,
        logical_delete_col="is_deleted",
        output_interval_minutes=1,
    )
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    pipeline = CdcPipeline(spark, [spec], sink)
    q = pipeline.start_stream(
        raw_path, checkpoint=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)
    # --------------------------------------------------------------------

    snap = sink.read(spark, spec.target_table)
    assert "is_deleted" in snap.columns  # logical-delete column present
    assert "o_orderkey" in snap.columns
    # natural key: exactly one row per o_orderkey
    n = snap.count()
    assert n > 0
    assert snap.select("o_orderkey").distinct().count() == n
    # some deletes exist in the fixture and stay as flagged rows
    assert snap.filter(F.col("is_deleted")).count() > 0
