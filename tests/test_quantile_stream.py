"""Streaming quantile-sketch maintainer (streaming/quantile_stream.py):
exact sample parity vs the batch bottom-k over arbitrary splits, replay
idempotence, the per-batch estimate trajectory, the DKW in-bound check
wire, and a real availableNow stream."""

from __future__ import annotations

import os
import random

import pytest

from snowflake_cdc_spark.operators.quantile_sketch import bottomk_sample
from snowflake_cdc_spark.streaming.quantile_stream import (
    QuantileSketchMaintainer,
)


def _df(spark, rows):
    """rows: (id, value)."""
    return spark.createDataFrame(rows, "pk long, v bigint")


def _batch_sample(spark, rows, k):
    return {
        (r.h, r.v)
        for r in bottomk_sample(_df(spark, rows), "v", "pk", k=k).collect()
    }


class TestQuantileSketchMaintainer:
    @pytest.mark.parametrize("seed", [5, 29])
    def test_sample_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        rows = [(i, rng.randint(0, 10_000)) for i in range(400)]
        cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
        m = QuantileSketchMaintainer(
            str(tmp_path / f"q{seed}"), "v", "pk", k=64
        )
        prev = 0
        for i, c in enumerate(cuts + [len(rows)]):
            m.process_batch(_df(spark, rows[prev:c]), i)
            prev = c
        got = {(r.h, r.v) for r in m.sample(spark).collect()}
        assert got == _batch_sample(spark, rows, 64)

    def test_replay_is_idempotent(self, spark, tmp_path):
        rng = random.Random(9)
        b0 = [(i, rng.randint(0, 999)) for i in range(100)]
        b1 = [(i + 100, rng.randint(0, 999)) for i in range(100)]
        m = QuantileSketchMaintainer(str(tmp_path / "s"), "v", "pk", k=32)
        m.process_batch(_df(spark, b0), 0)
        m.process_batch(_df(spark, b1), 1)
        before = {(r.h, r.v) for r in m.sample(spark).collect()}
        m.process_batch(_df(spark, b1), 1)  # checkpoint-restart replay
        assert {(r.h, r.v) for r in m.sample(spark).collect()} == before
        assert before == _batch_sample(spark, b0 + b1, 32)

    def test_fresh_maintainer_is_empty_not_crash(self, spark, tmp_path):
        m = QuantileSketchMaintainer(str(tmp_path / "never"), "v", "pk")
        assert m.sample(spark).count() == 0
        assert m.estimate_log(spark).count() == 0

    def test_estimate_trajectory_and_check(self, spark, tmp_path):
        """Per-batch estimates land in the log; the final maintained
        estimates pass the DKW in-bound check against everything seen."""
        rng = random.Random(21)
        rows = [(i, rng.randint(0, 100_000)) for i in range(3_000)]
        m = QuantileSketchMaintainer(
            str(tmp_path / "s"), "v", "pk", k=256
        )
        m.process_batch(_df(spark, rows[:1500]), 0)
        m.process_batch(_df(spark, rows[1500:]), 1)
        log = m.estimate_log(spark).collect()
        assert {r.batch for r in log} == {0, 1}
        assert len(log) == 2 * 4  # 4 default quantiles per batch
        chk = m.check(_df(spark, rows)).collect()
        assert len(chk) == 4
        assert all(r.within_bound for r in chk)


def test_run_stream_e2e(spark, tmp_path):
    rng = random.Random(31)
    rows = [(i, rng.randint(0, 50_000)) for i in range(500)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    df = _df(spark, rows)
    df.filter("pk < 250").coalesce(1).write.parquet(src + "/f0")
    df.filter("pk >= 250").coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = QuantileSketchMaintainer(str(tmp_path / "state"), "v", "pk", k=128)
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = {(r.h, r.v) for r in m.sample(spark).collect()}
    assert got == _batch_sample(spark, rows, 128)
    chk = m.check(df).collect()
    assert chk and all(r.within_bound for r in chk)
