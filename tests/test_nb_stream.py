"""Streaming NB classifier maintainer (streaming/nb_stream.py): exact
state parity vs a pure-Python one-shot count over arbitrary splits,
replay idempotence, maintained-model == batch nb_train equivalence,
scoring through the maintained model, and a real availableNow stream."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.streaming.nb_stream import _DOC_KEY, NbClassifierMaintainer

POS_WORDS = ["alpha", "beta", "gamma", "delta"]
NEG_WORDS = ["omega", "sigma", "theta", "kappa"]
SHARED = ["common", "filler"]


def _docs(rng, n):
    rows = []
    for _ in range(n):
        pos = rng.random() < 0.5
        vocab = (POS_WORDS if pos else NEG_WORDS) + SHARED
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 10)))
        rows.append((text, pos))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "text string, pos boolean")


def _expected(batches):
    exp = {}
    d1 = d0 = 0
    for rows in batches:
        for text, pos in rows:
            d1 += pos
            d0 += not pos
            for w in text.split():
                c1, c0 = exp.get(w, (0, 0))
                exp[w] = (c1 + pos, c0 + (not pos))
    exp[_DOC_KEY] = (d1, d0)
    return exp


def _state(m, spark):
    return {r["w"]: (r["c1"], r["c0"]) for r in m.state(spark).collect()}


class TestNbClassifierMaintainer:
    @pytest.mark.parametrize("seed", [7, 31])
    def test_state_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        batches = [_docs(rng, rng.randint(2, 8)) for _ in range(3)]
        m = NbClassifierMaintainer(str(tmp_path / f"s{seed}"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        assert _state(m, spark) == _expected(batches)

    def test_replay_is_idempotent(self, spark, tmp_path):
        rng = random.Random(13)
        batches = [_docs(rng, 4), _docs(rng, 4)]
        m = NbClassifierMaintainer(str(tmp_path / "replay"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        before = _state(m, spark)
        m.process_batch(_df(spark, batches[1]), 1)
        assert _state(m, spark) == before

    def test_model_equals_batch_nb_train(self, spark, tmp_path):
        """The maintained model is bit-identical to nb_train over the
        union of all batches — counts merge exactly, lns derive at read."""
        from snowflake_cdc_spark.operators.nb import nb_train

        rng = random.Random(17)
        batches = [_docs(rng, 6) for _ in range(3)]
        m = NbClassifierMaintainer(str(tmp_path / "model"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        lr_m, k_m = m.model(spark)

        all_rows = [r for rows in batches for r in rows]
        train = _df(spark, all_rows).select(
            F.monotonically_increasing_id().alias("doc_id"),
            "pos",
            F.split("text", " ").alias("ws"),
        )
        lr_b, k_b = nb_train(train)
        assert {tuple(r) for r in lr_m.collect()} == {
            tuple(r) for r in lr_b.collect()
        }
        assert k_m.collect() == k_b.collect()

    def test_scoring_separates_planted_classes(self, spark, tmp_path):
        rng = random.Random(19)
        m = NbClassifierMaintainer(str(tmp_path / "score"))
        m.process_batch(_df(spark, _docs(rng, 30)), 0)
        test = spark.createDataFrame(
            [
                (1, True, ["alpha", "beta", "common"]),
                (2, False, ["omega", "kappa", "filler"]),
            ],
            "doc_id int, pos boolean, ws array<string>",
        )
        got = {r["doc_id"]: r["pred_pos"] for r in m.score(test).collect()}
        assert got == {1: True, 2: False}

    def test_available_now_stream(self, spark, tmp_path):
        rng = random.Random(23)
        rows = _docs(rng, 12)
        src = str(tmp_path / "src")
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(src)
        m = NbClassifierMaintainer(str(tmp_path / "stream"))
        feed = spark.readStream.schema("text string, pos boolean").parquet(src)
        q = m.run_stream(feed, str(tmp_path / "ckpt"))
        q.awaitTermination(300)
        assert _state(m, spark) == _expected([rows])
