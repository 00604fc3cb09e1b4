"""Incremental SCD2 maintenance (streaming/scd_stream.py): the streamed,
per-batch-spliced history must equal the batch operator's full-log
rebuild — including out-of-order arrivals that land BETWEEN existing
versions and re-deliveries that collapse into existing runs."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.scd import scd2_from_changes
from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
from snowflake_cdc_spark.streaming.scd_stream import Scd2Maintainer

SCHEMA = "k int, v string, ts int, seq long"


def _log(n_keys=6, n_changes=60, seed=7):
    rng = random.Random(seed)
    rows = []
    for seq in range(n_changes):
        rows.append(
            Row(
                k=rng.randrange(n_keys),
                v=rng.choice(["a", "b", "c"]),
                ts=rng.randrange(20),
                seq=seq,
            )
        )
    return rows


def _canon(df):
    return sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in df.select("k", "v", "valid_from", "valid_to", "is_current").collect()
    )


def _maintainer(tmp_path):
    return Scd2Maintainer(
        ParquetSnapshotSink(str(tmp_path / "hist")),
        "dim",
        ["k"],
        "v",
        "ts",
        "seq",
    )


def test_multi_batch_equals_full_rebuild(spark, tmp_path):
    rows = _log()
    m = _maintainer(tmp_path)
    # arbitrary batch split — includes interleaved/out-of-order timestamps
    for bid, lo in enumerate(range(0, len(rows), 17)):
        m.process_batch(spark.createDataFrame(rows[lo : lo + 17], SCHEMA), bid)
    full = scd2_from_changes(
        spark.createDataFrame(rows, SCHEMA), ["k"], "v", "ts", "seq"
    )
    assert _canon(m.snapshot(spark)) == _canon(full)


def test_late_event_splits_an_existing_run(spark, tmp_path):
    m = _maintainer(tmp_path)
    b1 = [Row(k=1, v="a", ts=10, seq=0), Row(k=1, v="a", ts=30, seq=1)]
    m.process_batch(spark.createDataFrame(b1, SCHEMA), 0)
    # late arrival at ts=20 with a DIFFERENT value splits the single
    # a-run into a(10..20) b(20..30) a(30..) — the ts=30 change was
    # collapsed invisible in the dimension, only the LOG can re-open it
    m.process_batch(
        spark.createDataFrame([Row(k=1, v="b", ts=20, seq=2)], SCHEMA), 1
    )
    assert _canon(m.snapshot(spark)) == [
        (1, "a", 10, 20, False),
        (1, "a", 30, None, True),
        (1, "b", 20, 30, False),
    ]


def test_late_equal_value_collapses_silently(spark, tmp_path):
    m = _maintainer(tmp_path)
    m.process_batch(
        spark.createDataFrame([Row(k=1, v="a", ts=10, seq=0)], SCHEMA), 0
    )
    m.process_batch(
        spark.createDataFrame([Row(k=1, v="a", ts=20, seq=1)], SCHEMA), 1
    )
    assert _canon(m.snapshot(spark)) == [(1, "a", 10, None, True)]


def test_untouched_keys_pass_through(spark, tmp_path):
    m = _maintainer(tmp_path)
    m.process_batch(
        spark.createDataFrame(
            [Row(k=1, v="a", ts=10, seq=0), Row(k=2, v="x", ts=10, seq=1)], SCHEMA
        ),
        0,
    )
    v_before = m.sink.current_version("dim")
    m.process_batch(
        spark.createDataFrame([Row(k=2, v="y", ts=20, seq=2)], SCHEMA), 1
    )
    snap = m.snapshot(spark)
    assert _canon(snap.filter(F.col("k") == 1)) == [(1, "a", 10, None, True)]
    assert _canon(snap.filter(F.col("k") == 2)) == [
        (2, "x", 10, 20, False),
        (2, "y", 20, None, True),
    ]
    assert m.sink.current_version("dim") == v_before + 1  # versioned flip


def test_streaming_runner_parity(spark, tmp_path):
    """End-to-end through readStream/foreachBatch (availableNow)."""
    rows = _log(n_keys=4, n_changes=30, seed=11)
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).repartition(3).write.mode(
        "overwrite"
    ).parquet(src)
    m = _maintainer(tmp_path)
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    full = scd2_from_changes(
        spark.createDataFrame(rows, SCHEMA), ["k"], "v", "ts", "seq"
    )
    assert _canon(m.snapshot(spark)) == _canon(full)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch may re-deliver a batch after a crash-restart: the
    per-batch_id overwritten log subdir makes the replay a no-op."""
    m = _maintainer(tmp_path)
    b = spark.createDataFrame(
        [Row(k=1, v="a", ts=10, seq=0), Row(k=1, v="b", ts=20, seq=1)], SCHEMA
    )
    m.process_batch(b, 0)
    before = _canon(m.snapshot(spark))
    m.process_batch(b, 0)  # replay of the SAME batch id
    assert _canon(m.snapshot(spark)) == before
