"""Stream-stream interval join (streaming/joins.py): watermarked two-stream
join executes under availableNow and matches the identical batch join —
Spark's batch/stream contract for the same expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.sources.io import read_table
from snowflake_cdc_spark.streaming.event_time import epoch_seconds
from snowflake_cdc_spark.streaming.joins import interval_join
from tests.conftest import SF_SMOKE


def _sources(spark, tmp_path):
    """Split events into clicks (left) and purchases (right), landed as
    micro-batchable parquet with plain micros timestamps."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    left_dir, right_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "click").coalesce(3).write.mode(
        "overwrite"
    ).parquet(left_dir)
    ev.filter(F.col("event_type") == "purchase").coalesce(3).write.mode(
        "overwrite"
    ).parquet(right_dir)
    return left_dir, right_dir


def _canon(rows):
    return sorted((r["event_id"], r["r_event_id"]) for r in rows)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    left_dir, right_dir = _sources(spark, tmp_path)
    lb, rb = spark.read.parquet(left_dir), spark.read.parquet(right_dir)

    kwargs = dict(
        key="user_id", left_ts="ts", right_ts="ts",
        max_lag="30 minutes", watermark="1 hour",
    )
    want = _canon(
        interval_join(lb, rb, **kwargs)
        .select(F.col("l_event_id").alias("event_id"), "r_event_id")
        .collect()
    )
    assert want, "fixture should produce at least one click<-purchase match"

    ls = spark.readStream.schema(lb.schema).option("maxFilesPerTrigger", 1).parquet(left_dir)
    rs = spark.readStream.schema(rb.schema).option("maxFilesPerTrigger", 1).parquet(right_dir)
    out = interval_join(ls, rs, **kwargs).select(
        F.col("l_event_id").alias("event_id"), "r_event_id"
    )

    got = []

    def sink(df, _bid):
        got.extend(df.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert _canon(got) == want


def test_interval_join_left_outer_stream(spark, tmp_path):
    """Left-outer stream-stream: matched rows equal the batch join; NULL
    right-side rows emit once the watermark passes a left row's join
    window. Rows inside the final watermark gap are legitimately withheld
    at availableNow termination (Spark's outer-join contract), so the
    stream result is: all batch inner matches + a subset of the batch
    outer NULLs — and nothing outside the batch outer result."""
    left_dir, right_dir = _sources(spark, tmp_path)
    lb, rb = spark.read.parquet(left_dir), spark.read.parquet(right_dir)

    kwargs = dict(
        key="user_id", left_ts="ts", right_ts="ts",
        max_lag="30 minutes", watermark="1 hour", how="left_outer",
    )
    sel = lambda df: df.select(F.col("l_event_id").alias("event_id"), "r_event_id")
    want_outer = _canon(sel(interval_join(lb, rb, **kwargs)).collect())
    want_inner = [(a, b) for a, b in want_outer if b is not None]
    assert any(b is None for _, b in want_outer), "need unmatched left rows"

    ls = spark.readStream.schema(lb.schema).option("maxFilesPerTrigger", 1).parquet(left_dir)
    rs = spark.readStream.schema(rb.schema).option("maxFilesPerTrigger", 1).parquet(right_dir)
    got = []
    q = (
        sel(interval_join(ls, rs, **kwargs))
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _bid: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_c = _canon(got)
    assert [p for p in got_c if p[1] is not None] == want_inner
    assert set(got_c) <= set(want_outer)
    assert any(b is None for _, b in got_c), (
        "watermark should have released at least one NULL-right row"
    )


def test_interval_join_requires_range_bound(spark, tmp_path):
    """The helper always emits the range predicate — the plan must carry a
    time-interval condition (state-eviction requirement), visible as a
    watermark in the streaming plan."""
    left_dir, right_dir = _sources(spark, tmp_path)
    lb = spark.read.parquet(left_dir)
    ls = spark.readStream.schema(lb.schema).parquet(left_dir)
    rs = spark.readStream.schema(lb.schema).parquet(right_dir)
    out = interval_join(ls, rs, key="user_id", left_ts="ts", right_ts="ts")
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()


def test_interval_join_checkpoint_restart(spark, tmp_path):
    """Exactly-once across a restart with data arriving BETWEEN runs: the
    first availableNow run drains only the early half of each side (split
    by event time, so the second tranche is never watermark-late), then
    the late half lands and the SAME checkpoint restarts. The union of
    emissions equals the batch join over everything, with no pair emitted
    twice — offsets and join state both survive the restart."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    sec = epoch_seconds("ts")
    cut = ev.select(F.percentile(sec, F.lit(0.5)).alias("p")).collect()[0]["p"]
    early = ev.filter(sec <= cut)
    late = ev.filter(sec > cut)
    left_dir, right_dir = str(tmp_path / "l_rs"), str(tmp_path / "r_rs")

    def land(part, mode):
        part.filter(F.col("event_type") == "click").coalesce(2).write.mode(
            mode
        ).parquet(left_dir)
        part.filter(F.col("event_type") == "purchase").coalesce(2).write.mode(
            mode
        ).parquet(right_dir)

    land(early, "overwrite")

    kwargs = dict(
        key="user_id", left_ts="ts", right_ts="ts",
        max_lag="30 minutes", watermark="1 hour",
    )
    got = []

    def sink(df, _bid):
        got.extend(df.collect())

    schema = spark.read.parquet(left_dir).schema

    def run_once():
        ls = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(left_dir)
        )
        rs = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(right_dir)
        )
        out = interval_join(ls, rs, **kwargs).select(
            F.col("l_event_id").alias("event_id"), "r_event_id"
        )
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_rs"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()  # drains the early tranche only
    n_first = len(got)
    land(late, "append")  # second tranche arrives while the stream is down
    run_once()  # restart from the same checkpoint
    assert len(got) > n_first, "restart should emit the late tranche's matches"

    lb, rb = spark.read.parquet(left_dir), spark.read.parquet(right_dir)
    want = _canon(
        interval_join(lb, rb, **kwargs)
        .select(F.col("l_event_id").alias("event_id"), "r_event_id")
        .collect()
    )
    canon = _canon(got)
    assert len(canon) == len(set(canon)), "restart must not re-emit pairs"
    assert canon == want
