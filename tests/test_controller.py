"""Bulk controller: discovery from the stream, include/exclude,
already-handled skip, catalog-keyed specs, drift reconciliation loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.catalog import Catalog
from snowflake_cdc_spark.controller import PipelineController
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from tests.conftest import SF_SMOKE

ORDERS_CSV = (
    "tpch.orders,o_orderkey,bigint,true\n"
    "tpch.orders,o_custkey,bigint,false\n"
    "tpch.orders,o_orderstatus,varchar,false\n"
    "tpch.orders,o_totalprice,decimal,false\n"
    "tpch.orders,o_orderdate,datetime,false\n"
    "tpch.orders,o_orderpriority,varchar,false\n"
)


def land_raw(spark, tmp_path):
    raw = str(tmp_path / "raw")
    cdc_events_nested(spark, SF_SMOKE).write.mode("overwrite").parquet(raw)
    return raw


def test_add_new_tables_discovers_and_materializes(spark, tmp_path):
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog.from_columns_csv(ORDERS_CSV))

    specs = ctl.add_new_tables(raw)
    assert [s.full_table_name for s in specs] == ["tpch.orders"]
    # catalog had a PK → natural key, not synthetic
    assert specs[0].key_columns == ["o_orderkey"] and not specs[0].use_synthetic_key
    assert sink.read(spark, "ORDERS").count() == 1285

    # second invocation: already handled → nothing new (add_output.py:512-516)
    assert ctl.add_new_tables(raw) == []


def test_add_new_tables_exclude_and_unknown_table(spark, tmp_path):
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog())  # empty catalog

    specs = ctl.add_new_tables(raw, exclude={"TPCH.ORDERS"})  # case-insensitive
    assert specs == []

    specs = ctl.add_new_tables(raw)
    # no catalog entry → synthetic key fallback (K2)
    assert specs[0].use_synthetic_key
    assert sink.read(spark, "ORDERS").count() == 1285


def test_update_existing_tables_reconciles_drift(spark, tmp_path):
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog.from_columns_csv(ORDERS_CSV))
    ctl.add_new_tables(raw)

    # no drift: nothing to do
    assert ctl.update_existing_tables(raw) == {}

    # catalog gains a column the snapshot lacks → reconcile widens
    drifted = Catalog.from_columns_csv(ORDERS_CSV + "tpch.orders,o_comment,varchar,false\n")
    ctl.catalog = drifted
    changed = ctl.update_existing_tables(raw)
    assert changed == {"tpch.orders": ["o_comment"]}
    assert "o_comment" in sink.read(spark, "ORDERS").columns
