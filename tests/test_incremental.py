"""Incremental aggregate maintenance (operators/incremental.py): batching
invariance, zero-count group eviction, and state persistence across
batches through a parquet round-trip."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.incremental import (
    aggregate_from_retractions,
    retraction_stream,
    update_aggregate,
)
from snowflake_cdc_spark.sources.cdc import ORDER_COLS, cdc_events_flat
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunking_invariance(spark):
    """One batch vs per-op batches: identical state (exact decimal sums)."""
    flat = cdc_events_flat(spark, SF_SMOKE).cache()
    one = aggregate_from_retractions(
        flat, ORDER_COLS, ["o_orderpriority"], ["o_totalprice"]
    )
    chunked = aggregate_from_retractions(
        flat, ORDER_COLS, ["o_orderpriority"], ["o_totalprice"], n_chunks_by="op"
    )
    assert _rows(one) == _rows(chunked)
    flat.unpersist()


def test_matches_snapshot_aggregate(spark):
    """Maintained aggregate == aggregate over the materialized snapshot."""
    from snowflake_cdc_spark.operators.upsert import latest_by_key

    flat = cdc_events_flat(spark, SF_SMOKE).cache()
    maintained = aggregate_from_retractions(
        flat, ORDER_COLS, ["o_orderpriority"], ["o_totalprice"], n_chunks_by="op"
    )
    snap = (
        latest_by_key(flat, ["primary_key"], seq_col="seq")
        .filter(~F.col("is_delete"))
        .groupBy(F.col("row_o_orderpriority").alias("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("row_o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_o_totalprice"),
        )
    )
    assert _rows(maintained) == _rows(snap)
    flat.unpersist()


def _mk_flat(spark, rows):
    """rows: (seq, is_delete, row_g, row_v, old_g, old_v)"""
    return spark.createDataFrame(
        rows, "seq long, is_delete boolean, row_g string, row_v double, old_row_g string, old_row_v double"
    )


def test_group_evicted_at_zero_count(spark):
    flat = _mk_flat(
        spark,
        [
            (1, False, "a", 5.0, None, None),   # insert a=5
            (2, False, "b", 7.0, None, None),   # insert b=7
            (3, True, None, None, "a", 5.0),    # delete the only 'a' row
        ],
    )
    state = update_aggregate(
        None, retraction_stream(flat, ["g", "v"]), ["g"], ["v"]
    )
    rows = {r.g: (r.n, r.sum_v) for r in state.collect()}
    assert rows == {"b": (1, Decimal("7.00"))}


def test_update_moves_row_between_groups(spark):
    flat = _mk_flat(
        spark,
        [
            (1, False, "a", 5.0, None, None),        # insert into a
            (2, False, "b", 5.0, "a", 5.0),          # update: moves a -> b
        ],
    )
    state = update_aggregate(
        None, retraction_stream(flat, ["g", "v"]), ["g"], ["v"]
    )
    rows = {r.g: (r.n, r.sum_v) for r in state.collect()}
    assert rows == {"b": (1, Decimal("5.00"))}


def test_state_persists_through_parquet(spark, tmp_path):
    """Batch-at-a-time maintenance with the state round-tripping through
    storage between batches (the foreachBatch deployment shape)."""
    state_dir = str(tmp_path / "agg_state")
    b1 = _mk_flat(spark, [(1, False, "a", 1.0, None, None), (2, False, "a", 2.0, None, None)])
    b2 = _mk_flat(spark, [(3, False, "b", 9.0, None, None), (4, True, None, None, "a", 1.0)])

    s1 = update_aggregate(None, retraction_stream(b1, ["g", "v"]), ["g"], ["v"])
    s1.write.mode("overwrite").parquet(state_dir)

    prev = spark.read.parquet(state_dir)
    s2 = update_aggregate(prev, retraction_stream(b2, ["g", "v"]), ["g"], ["v"])
    rows = {r.g: (r.n, r.sum_v) for r in s2.collect()}
    assert rows == {"a": (1, Decimal("2.00")), "b": (1, Decimal("9.00"))}
