"""Checkpoint-restart semantics for the streaming dedup lane: state must
survive a stop/start, so a duplicate re-delivered AFTER the restart (same
dedup keys + event time, still inside the watermark) is suppressed by the
restored state store, while genuinely new rows flow through."""

from __future__ import annotations

import datetime as dt

from snowflake_cdc_spark.streaming.dedup_stream import dedup_stream

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(*specs):
    return [(i, T0 + dt.timedelta(minutes=m), k) for i, (m, k) in enumerate(specs)]


def test_dedup_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def drain():
        stream = spark.readStream.schema("i long, ts timestamp_ntz, k string").parquet(
            src
        )
        q = (
            dedup_stream(stream, ["k"], ts_col="ts", watermark="30 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _b: out.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    batch1 = _rows((0, "a"), (0, "a"), (5, "b"))  # in-batch dup of a
    spark.createDataFrame(batch1, "i long, ts timestamp_ntz, k string").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    drain()
    assert sorted(r["k"] for r in out) == ["a", "b"]

    # stream is down; a re-delivery of (a, T0) and a new key arrive
    batch2 = [(10, T0, "a"), (11, T0 + dt.timedelta(minutes=10), "c")]
    spark.createDataFrame(batch2, "i long, ts timestamp_ntz, k string").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()

    ks = sorted(r["k"] for r in out)
    assert ks == ["a", "b", "c"], f"restored state must suppress the re-delivery: {ks}"


def test_windowed_counts_state_survives_restart(spark, tmp_path):
    """Windowed-aggregation state crosses a restart: rows for the SAME
    event-time window arriving after a stop/start must merge into that
    window's count (update mode), not start a fresh one."""
    from snowflake_cdc_spark.streaming.windows import windowed_counts

    src = str(tmp_path / "wsrc")
    ckpt = str(tmp_path / "wckpt")
    latest: dict = {}

    def drain():
        stream = spark.readStream.schema("i long, ts timestamp_ntz").parquet(src)
        q = (
            windowed_counts(stream, ts_col="ts", window="15 minutes",
                            watermark="30 minutes")
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _b: latest.update(
                    {r["win_start"]: r["n"] for r in df.collect()}
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    w0 = T0.replace(minute=0)
    batch1 = [(0, w0 + dt.timedelta(minutes=1)), (1, w0 + dt.timedelta(minutes=2))]
    spark.createDataFrame(batch1, "i long, ts timestamp_ntz").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    drain()
    assert latest == {w0: 2}

    batch2 = [(2, w0 + dt.timedelta(minutes=3)), (3, w0 + dt.timedelta(minutes=20))]
    spark.createDataFrame(batch2, "i long, ts timestamp_ntz").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    assert latest == {w0: 3, w0 + dt.timedelta(minutes=15): 1}, latest
