"""Seq-tie semantics: redelivery must never regress; backfill must win.

The failure this guards against: after an E3 backfill populates a new
column at seq=k, an at-least-once redelivery of the ORIGINAL seq=k event
(which predates the column) must not null the column back out."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.skew import count_distinct_two_phase
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_redelivery_does_not_regress_backfilled_column(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    old_schema = "key long, seq long, value long, is_delete boolean"
    new_schema = "key long, seq long, value long, extra string, is_delete boolean"

    # original event, pre-drift
    sink.merge(_df(spark, [(1, 42, 10, False)], old_schema), "T", ["key"])
    # E3 backfill replays seq=42 carrying the new column → must win the tie
    sink.merge(
        _df(spark, [(1, 42, 10, "filled", False)], new_schema),
        "T",
        ["key"],
        prefer_incoming_on_tie=True,
    )
    snap = sink.read(spark, "T")
    assert snap.collect()[0].extra == "filled"

    # at-least-once redelivery of the ORIGINAL pre-drift event (no extra)
    sink.merge(_df(spark, [(1, 42, 10, False)], old_schema), "T", ["key"])
    snap = sink.read(spark, "T")
    assert snap.collect()[0].extra == "filled", "redelivery regressed the backfill"


def test_stored_wins_ties_by_default(spark, tmp_path):
    sink = ParquetSnapshotSink(str(tmp_path / "snap"))
    schema = "key long, seq long, value long, is_delete boolean"
    sink.merge(_df(spark, [(1, 7, 100, False)], schema), "T", ["key"])
    # same seq, different value (pathological duplicate): stored row wins
    sink.merge(_df(spark, [(1, 7, 999, False)], schema), "T", ["key"])
    assert sink.read(spark, "T").collect()[0].value == 100


def test_two_phase_distinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, None), (2, None)], "g long, v string"
    )
    got = {r.g: r.n for r in count_distinct_two_phase(df, ["g"], "v").collect()}
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    # group 2 has only NULLs → count 0 → group may be absent in both forms
    assert got.get(1) == want.get(1) == 1
    assert got.get(2, 0) == want.get(2, 0) == 0
