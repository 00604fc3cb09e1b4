"""Raw-zone layout (sources/raw_zone.py): partition pruning is real (the
physical plan carries PartitionFilters and reads fewer files), and the
materialization over a pruned zone equals the unpruned one."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.sources.cdc import cdc_events_nested
from snowflake_cdc_spark.sources.raw_zone import land_raw_zone, read_raw_zone
from tests.conftest import SF_SMOKE


def _land(spark, tmp_path, bucket=500):
    zone = str(tmp_path / "raw")
    land_raw_zone(cdc_events_nested(spark, SF_SMOKE), zone, seq_bucket_size=bucket)
    return zone


def test_partition_pruning_in_plan(spark, tmp_path):
    zone = _land(spark, tmp_path)
    pruned = read_raw_zone(spark, zone, table="tpch.orders_part_0")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter, not a
    # post-scan row filter
    assert "p_table" in plan.split("PartitionFilters")[1][:200]


def test_table_and_seq_pruning_semantics(spark, tmp_path):
    zone = _land(spark, tmp_path, bucket=500)
    full = cdc_events_nested(spark, SF_SMOKE)
    want_tables = {
        r[0]
        for r in full.select(F.col("data.full_table_name")).distinct().collect()
    }
    one = read_raw_zone(spark, zone, table=sorted(want_tables)[0])
    got = {r[0] for r in one.select(F.col("data.full_table_name")).distinct().collect()}
    assert got == {sorted(want_tables)[0]}

    # seq horizon: pruned read == full read filtered by seq
    horizon = 750
    pruned = read_raw_zone(spark, zone, min_seq=horizon, seq_bucket_size=500)
    assert pruned.count() == full.filter(F.col("seq") >= horizon).count()
    assert pruned.agg(F.min("seq")).collect()[0][0] >= horizon


def test_roundtrip_preserves_envelope(spark, tmp_path):
    zone = _land(spark, tmp_path)
    back = read_raw_zone(spark, zone)
    full = cdc_events_nested(spark, SF_SMOKE)
    assert sorted(back.columns) == sorted(full.columns)
    assert back.count() == full.count()
    a = {r["seq"] for r in back.select("seq").collect()}
    b = {r["seq"] for r in full.select("seq").collect()}
    assert a == b


def test_partitioned_backfill_matches_unpartitioned(spark, tmp_path):
    """E3 over a partitioned zone (seq-bucket pruning path) produces the
    identical snapshot to the plain row-filtered replay."""
    from datetime import datetime, timedelta

    from snowflake_cdc_spark.plans.spec import PipelineSpec
    from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
    from snowflake_cdc_spark.streaming.evolution import backfill
    from snowflake_cdc_spark.streaming.pipeline import CdcPipeline

    base = datetime(2024, 1, 1)
    events = cdc_events_nested(spark, SF_SMOKE).withColumn(
        "event_time",
        F.lit(base) + F.make_interval(secs=F.col("seq").cast("double")),
    )
    flat_dir = str(tmp_path / "flat_zone")
    events.coalesce(3).write.mode("overwrite").parquet(flat_dir)
    part_dir = str(tmp_path / "part_zone")
    land_raw_zone(events, part_dir, seq_bucket_size=500)

    first_seen = base + timedelta(seconds=700)

    def run(zone, partitioned):
        sink = ParquetSnapshotSink(str(tmp_path / f"snap_{partitioned}"))
        pipe = CdcPipeline(
            spark,
            [PipelineSpec("tpch.orders", use_synthetic_key=True)],
            sink,
        )
        backfill(
            spark, pipe, zone, first_seen,
            partitioned_zone=partitioned, seq_bucket_size=500,
        )
        return sink.read(spark, "ORDERS")

    a = run(flat_dir, False)
    b = run(part_dir, True)
    assert a.count() == b.count() > 0
    ca = sorted(tuple(r) for r in a.select(sorted(a.columns)).collect())
    cb = sorted(tuple(r) for r in b.select(sorted(b.columns)).collect())
    assert ca == cb


def test_landing_format_parity(spark, tmp_path):
    """Round-3: the zone layout (and everything downstream of it) is
    format-independent — ORC and schema-supplied JSON landings round-trip
    the envelope byte-for-byte against the parquet landing, including
    nested struct fields, timestamps, and the pruning contract."""
    events = cdc_events_nested(spark, SF_SMOKE)

    def landed_rows(fmt):
        zone = str(tmp_path / f"raw_{fmt}")
        land_raw_zone(events, zone, seq_bucket_size=500, fmt=fmt)
        df = read_raw_zone(
            spark, zone, min_seq=400, fmt=fmt,
            schema=events.schema if fmt == "json" else None,
        ).select("seq", F.to_json(F.struct("data")).alias("payload"))
        return sorted(map(tuple, df.collect()))

    base = landed_rows("parquet")
    assert len(base) > 0
    assert landed_rows("orc") == base
    assert landed_rows("json") == base


def test_dynamic_partition_pruning_via_dim_join(spark, tmp_path):
    """Static pruning covers WHERE p_table='x'; the other 100-TB access
    pattern is pruning through a JOIN — 'process the tables listed in
    this (filtered) control table'. Catalyst's dynamic partition pruning
    must push the dim-side filter into the zone scan's PartitionFilters
    as a runtime subquery, so the scan never lists the other tables'
    directories."""
    zone = _land(spark, tmp_path)
    all_tables = sorted(
        r[0]
        for r in spark.read.parquet(zone).select("p_table").distinct().collect()
    )
    # NB: the dim-side predicate must pass Catalyst's isLikelySelective
    # heuristic for the PartitionPruning rule to fire — an equality
    # comparison qualifies; a bare boolean attribute filter does NOT
    # (found the hard way; documented here so nobody "simplifies" the
    # filter back to a boolean column and silently loses DPP).
    dim = spark.createDataFrame(
        [(t, "on" if i % 2 == 0 else "off") for i, t in enumerate(all_tables)],
        "p_table string, status string",
    )
    zone_df = spark.read.parquet(zone)
    joined = zone_df.join(
        F.broadcast(dim.filter(F.col("status") == "on")), "p_table"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, (
        "dim-join must prune zone partitions at runtime:\n" + plan[:2000]
    )
    want = {t for i, t in enumerate(all_tables) if i % 2 == 0}
    got = {r[0] for r in joined.select("p_table").distinct().collect()}
    assert got == want
