"""Regression tests for the review findings: case-insensitive identifier
handling through the controller, natural-key casing, target collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.catalog import Catalog
from snowflake_cdc_spark.controller import PipelineController
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from tests.conftest import SF_SMOKE

UPPER_CSV = (
    "TPCH.ORDERS,O_ORDERKEY,bigint,true\n"
    "TPCH.ORDERS,O_CUSTKEY,bigint,false\n"
    "TPCH.ORDERS,O_ORDERSTATUS,varchar,false\n"
    "TPCH.ORDERS,O_TOTALPRICE,decimal,false\n"
    "TPCH.ORDERS,O_ORDERDATE,datetime,false\n"
    "TPCH.ORDERS,O_ORDERPRIORITY,varchar,false\n"
)


def land_raw(spark, tmp_path):
    raw = str(tmp_path / "raw")
    cdc_events_nested(spark, SF_SMOKE).write.mode("overwrite").parquet(raw)
    return raw


def test_catalog_tables_preserve_case(spark):
    cat = Catalog.from_columns_csv(UPPER_CSV)
    assert cat.tables() == ["TPCH.ORDERS"]  # not lowercased
    assert "tpch.orders" in cat  # lookups stay case-insensitive


def test_natural_key_casing_mismatch_still_applies_deletes(spark, tmp_path):
    """Catalog declares the PK upper-case, data fields are lower-case —
    the before-image key fallback must still fire (finding #2)."""
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    # data identity is 'tpch.orders'; catalog spells it upper-case — the
    # include list supplies the data's spelling for the demux filter
    ctl = PipelineController(spark, sink, Catalog.from_columns_csv(UPPER_CSV))
    specs = ctl.add_new_tables(raw, include={"tpch.orders"})
    assert specs and specs[0].key_columns == ["O_ORDERKEY"]
    snap = sink.read(spark, "ORDERS")
    assert snap.count() == 1285  # deletes applied despite casing mismatch
    key_col = [c for c in snap.columns if c.lower() == "o_orderkey"][0]
    assert snap.filter(F.col(key_col).isNull()).count() == 0


def test_include_case_insensitive_no_duplicates(spark, tmp_path):
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog())
    # include spelled upper-case: must dedup against discovered lower-case
    specs = ctl.add_new_tables(raw, include={"TPCH.ORDERS"}, run=False)
    assert len(specs) == 1
    assert specs[0].full_table_name == "tpch.orders"  # data spelling wins


def test_update_include_case_insensitive(spark, tmp_path):
    raw = land_raw(spark, tmp_path)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog.from_columns_csv(UPPER_CSV))
    ctl.add_new_tables(raw, include={"tpch.orders"})
    drifted = Catalog.from_columns_csv(UPPER_CSV + "TPCH.ORDERS,O_COMMENT,varchar,false\n")
    ctl.catalog = drifted
    # upper/lower include spellings both select the table
    changed = ctl.update_existing_tables(raw, include={"tpch.ORDERS"})
    assert changed == {"TPCH.ORDERS": ["O_COMMENT"]}


def test_target_collision_raises(spark, tmp_path):
    """Two schemas sharing a table name must not silently interleave."""
    raw0 = str(tmp_path / "raw")
    ev = cdc_events_nested(spark, SF_SMOKE)
    a = ev.filter(F.col("seq") % 2 == 0)
    b = ev.filter(F.col("seq") % 2 == 1).withColumn(
        "data",
        F.col("data").withField("database_name", F.lit("archive")).withField(
            "full_table_name", F.concat(F.lit("archive."), F.col("data.table_name"))
        ),
    )
    a.unionByName(b).write.mode("overwrite").parquet(raw0)
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    ctl = PipelineController(spark, sink, Catalog())
    with pytest.raises(ValueError, match="target table collision"):
        ctl.add_new_tables(raw0, run=False)
