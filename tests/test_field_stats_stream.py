"""Streaming per-field stats maintainer (streaming/field_stats.py):
exact state parity vs the one-shot batch aggregation over arbitrary
splits, replay idempotence, the top-N / first-last read surfaces, the
E3 backfill-start wire, and a real availableNow stream."""

from __future__ import annotations

import datetime
import os
import random

import pytest

from snowflake_cdc_spark.streaming.field_stats import FieldStatsMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _rows(rng, n):
    out = []
    for i in range(n):
        out.append(
            (
                rng.choice(["view", "click", "purchase"]),
                rng.choice(["ok", "err", None]),
                T0 + datetime.timedelta(minutes=rng.randint(0, 10_000)),
            )
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, status string, ts timestamp"
    )


def _expected(rows):
    """one-shot (field, val) -> (cnt, first, last) in plain Python."""
    exp = {}
    for et, st, ts in rows:
        for field, val in (("event_type", et), ("status", st)):
            if val is None:
                continue
            c, lo, hi = exp.get((field, val), (0, ts, ts))
            exp[(field, val)] = (c + 1, min(lo, ts), max(hi, ts))
    return exp


def _state(m, spark):
    return {
        (r.field, r.val): (r.cnt, r.first_seen, r.last_seen)
        for r in m.state(spark).collect()
    }


class TestFieldStatsMaintainer:
    @pytest.mark.parametrize("seed", [3, 17])
    def test_state_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        rows = _rows(rng, 250)
        cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
        m = FieldStatsMaintainer(
            str(tmp_path / f"s{seed}"), ["event_type", "status"]
        )
        prev = 0
        for i, c in enumerate(cuts + [len(rows)]):
            m.process_batch(_df(spark, rows[prev:c]), i)
            prev = c
        assert _state(m, spark) == _expected(rows)

    def test_replay_is_idempotent(self, spark, tmp_path):
        rng = random.Random(7)
        b0, b1 = _rows(rng, 80), _rows(rng, 60)
        m = FieldStatsMaintainer(str(tmp_path / "s"), ["event_type", "status"])
        m.process_batch(_df(spark, b0), 0)
        m.process_batch(_df(spark, b1), 1)
        before = _state(m, spark)
        m.process_batch(_df(spark, b1), 1)  # checkpoint-restart replay
        assert _state(m, spark) == before
        assert before == _expected(b0 + b1)

    def test_fresh_maintainer_is_empty_not_crash(self, spark, tmp_path):
        m = FieldStatsMaintainer(str(tmp_path / "never"), ["event_type"])
        assert m.state(spark).count() == 0
        assert m.field_summary(spark).count() == 0
        assert m.backfill_start_ts(spark) is None

    def test_read_surfaces(self, spark, tmp_path):
        rows = [
            ("view", "ok", T0),
            ("view", "ok", T0 + datetime.timedelta(hours=2)),
            ("click", "err", T0 + datetime.timedelta(hours=1)),
        ]
        m = FieldStatsMaintainer(str(tmp_path / "s"), ["event_type", "status"])
        m.process_batch(_df(spark, rows), 0)
        summ = {r.field: r for r in m.field_summary(spark).collect()}
        assert summ["event_type"].first_seen == T0
        assert summ["event_type"].last_seen == T0 + datetime.timedelta(hours=2)
        assert summ["event_type"].n_values == 2
        assert summ["event_type"].n_rows == 3
        top = [
            (r.val, r.cnt)
            for r in m.top_values(spark, 1)
            .filter("field = 'event_type'")
            .collect()
        ]
        assert top == [("view", 2)]

    def test_backfill_start_wire(self, spark, tmp_path):
        """E3: the backfill start derives from MAINTAINED first-seen
        minus the pad — no corpus rescan."""
        rows = [
            ("view", "ok", T0 + datetime.timedelta(hours=5)),
            ("click", None, T0),
        ]
        m = FieldStatsMaintainer(str(tmp_path / "s"), ["event_type", "status"])
        m.process_batch(_df(spark, rows), 0)
        got = m.backfill_start_ts(spark, pad_minutes=1)
        assert got == T0 - datetime.timedelta(minutes=1)
        # field-scoped: status first appears 5h later
        got_status = m.backfill_start_ts(spark, fields=["status"], pad_minutes=1)
        assert got_status == T0 + datetime.timedelta(hours=5, minutes=-1)


def test_reconcile_reads_maintained_first_seen(spark, tmp_path):
    """E3 parity closure (VERDICT r06 #3): reconcile()'s bounded
    backfill takes the drifted field's first-seen from the MAINTAINED
    state (nested data.row.* path) and produces the identical snapshot
    to the raw-zone-scan path."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from snowflake_cdc_spark.catalog import Catalog
    from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec
    from snowflake_cdc_spark.sinks.parquet_sink import ParquetSnapshotSink
    from snowflake_cdc_spark.streaming.evolution import reconcile
    from snowflake_cdc_spark.streaming.pipeline import CdcPipeline
    from tests.test_evolution import COLUMNS_CSV, drift_raw  # noqa: F401

    # rebuild the drift fixture inline (module fixture is test-scoped)
    import tests.test_evolution as te

    path_factory = type("F", (), {"mktemp": lambda self, n: tmp_path / n})()
    (tmp_path / "drift_raw").mkdir()
    gen = te.drift_raw.__wrapped__(spark, path_factory)
    path, median = gen

    base = datetime(2024, 1, 1)
    raw0 = spark.read.option("mergeSchema", "true").parquet(path).withColumn(
        "event_time",
        F.lit(base) + F.make_interval(secs=F.col("seq").cast("double")),
    )
    zone = str(tmp_path / "zone")
    raw0.coalesce(2).write.parquet(zone)

    def run(with_maintainer: bool):
        sink = ParquetSnapshotSink(str(tmp_path / f"snap{with_maintainer}"))
        pipe = CdcPipeline(
            spark,
            [
                PipelineSpec(
                    "tpch.orders",
                    use_synthetic_key=True,
                    delete_strategy=DeleteStrategy.HARD,
                )
            ],
            sink,
        )
        # pre-drift generation ONLY (gen0 file schema has no o_comment —
        # a mergeSchema read of the whole zone would already carry it)
        pre = spark.read.parquet(path.replace("gen*", "gen0"))
        pipe.materialize_batch(pre)
        m = None
        if with_maintainer:
            m = FieldStatsMaintainer(
                str(tmp_path / "fs"),
                ["data.row.o_comment"],
                ts_col="event_time",
            )
            m.process_batch(spark.read.option("mergeSchema", "true").parquet(zone), 0)
        meta = Catalog.from_columns_csv(COLUMNS_CSV).get("tpch.orders")
        new = reconcile(
            spark, pipe, sink, meta, "ORDERS", zone,
            ts_col="event_time", field_stats=m,
        )
        assert new == ["o_comment"]
        return sink.read(spark, "ORDERS")

    a = run(False)
    b = run(True)
    cols = sorted(set(a.columns) & set(b.columns))
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    ra = sorted((tuple(r) for r in a.select(cols).collect()), key=key)
    rb = sorted((tuple(r) for r in b.select(cols).collect()), key=key)
    assert ra == rb and len(ra) > 0


def test_run_stream_e2e(spark, tmp_path):
    rng = random.Random(11)
    rows = _rows(rng, 120)
    src = str(tmp_path / "src")
    os.makedirs(src)
    df = _df(spark, rows)
    df.limit(60).coalesce(1).write.parquet(src + "/f0")
    df.subtract(df.limit(60)).coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = FieldStatsMaintainer(str(tmp_path / "state"), ["event_type", "status"])
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    # the file split may dedupe identical rows via subtract — compare
    # against what actually streamed
    streamed = [
        (r.event_type, r.status, r.ts)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(src)
        .collect()
    ]
    assert _state(m, spark) == _expected(streamed)
