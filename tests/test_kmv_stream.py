"""Streaming KMV distinct-count maintainer (streaming/kmv_stream.py):
sketch parity vs the batch q135 form over arbitrary splits, replay
idempotence, below-k exactness, and a real availableNow stream."""

from __future__ import annotations

import os
import random

import pytest

from snowflake_cdc_spark.operators.sketches import kmv_estimate, kmv_sketch
from snowflake_cdc_spark.streaming.kmv_stream import DistinctCountMaintainer


def _df(spark, rows):
    """rows: (group, key)."""
    return spark.createDataFrame(rows, "event_type string, user_id long")


def _batch_sketch(spark, rows, k):
    return {
        (r.event_type, r.h)
        for r in kmv_sketch(_df(spark, rows), "user_id", "event_type", k=k).collect()
    }


class TestDistinctCountMaintainer:
    @pytest.mark.parametrize("seed", [1, 23])
    def test_sketch_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        rows = [
            (rng.choice(["a", "b", "c"]), rng.randint(1, 500))
            for _ in range(300)
        ]
        cuts = sorted(rng.sample(range(1, len(rows)), rng.randint(1, 4)))
        m = DistinctCountMaintainer(str(tmp_path / f"k{seed}"), k=32)
        prev = 0
        for i, c in enumerate(cuts + [len(rows)]):
            m.process_batch(_df(spark, rows[prev:c]), i)
            prev = c
        got = {(r.grp, r.h) for r in m.sketch(spark).collect()}
        assert got == _batch_sketch(spark, rows, 32)
        # and the estimates agree exactly (same sketch, same formula)
        want_est = {
            (r.event_type, r.kmv_est)
            for r in kmv_estimate(
                kmv_sketch(_df(spark, rows), "user_id", "event_type", k=32),
                "event_type",
                k=32,
            ).collect()
        }
        assert {(r.grp, r.kmv_est) for r in m.estimates(spark).collect()} == want_est

    def test_below_k_is_exact(self, spark, tmp_path):
        m = DistinctCountMaintainer(str(tmp_path / "s"), k=32)
        m.process_batch(_df(spark, [("a", 1), ("a", 2), ("a", 1)]), 0)
        m.process_batch(_df(spark, [("a", 3), ("a", 2)]), 1)
        out = {r.grp: r.kmv_est for r in m.estimates(spark).collect()}
        assert out == {"a": 3.0}

    def test_fresh_maintainer_is_empty_not_crash(self, spark, tmp_path):
        m = DistinctCountMaintainer(str(tmp_path / "never_ran"), k=8)
        assert m.sketch(spark).count() == 0
        assert m.estimates(spark).count() == 0

    def test_replay_is_idempotent(self, spark, tmp_path):
        m = DistinctCountMaintainer(str(tmp_path / "s"), k=8)
        b0 = [("a", i) for i in range(40)]
        b1 = [("a", i) for i in range(30, 70)]
        m.process_batch(_df(spark, b0), 0)
        m.process_batch(_df(spark, b1), 1)
        before = {(r.grp, r.h) for r in m.sketch(spark).collect()}
        m.process_batch(_df(spark, b1), 1)  # checkpoint-restart replay
        assert {(r.grp, r.h) for r in m.sketch(spark).collect()} == before
        assert before == _batch_sketch(spark, b0 + b1, 8)


def test_run_stream_e2e(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("a", i) for i in range(60)] + [("b", i % 9) for i in range(30)]
    df = _df(spark, rows)
    df.limit(45).coalesce(1).write.parquet(src + "/f0")
    df.subtract(df.limit(45)).coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = DistinctCountMaintainer(str(tmp_path / "state"), k=16)
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert {(r.grp, r.h) for r in m.sketch(spark).collect()} == _batch_sketch(
        spark, rows, 16
    )
