"""Streaming vocabulary-novelty maintainer (streaming/vocab_stream.py):
exact state parity vs a pure-Python one-shot aggregation over arbitrary
splits, replay idempotence, the novelty-curve read, and a real
availableNow stream."""

from __future__ import annotations

import random

import pytest

from snowflake_cdc_spark.streaming.vocab_stream import VocabNoveltyMaintainer

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]


def _docs(rng, n, vocab):
    return [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))),)
        for _ in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "text string")


def _expected(batches):
    """word -> (count, first batch containing it), pure Python."""
    exp = {}
    for b, rows in enumerate(batches):
        for (text,) in rows:
            for w in text.split():
                c, fb = exp.get(w, (0, b))
                exp[w] = (c + 1, min(fb, b))
    return exp


def _state(m, spark):
    return {
        r["w"]: (r["cnt"], r["first_batch"])
        for r in m.state(spark).collect()
    }


class TestVocabNoveltyMaintainer:
    @pytest.mark.parametrize("seed", [5, 23])
    def test_state_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        # batches draw from GROWING vocab prefixes so later batches
        # genuinely introduce new words
        batches = [
            _docs(rng, rng.randint(2, 8), WORDS[: 3 + b * 2])
            for b in range(3)
        ]
        m = VocabNoveltyMaintainer(str(tmp_path / f"s{seed}"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        assert _state(m, spark) == _expected(batches)

    def test_replay_is_idempotent(self, spark, tmp_path):
        rng = random.Random(11)
        batches = [_docs(rng, 4, WORDS[:4]), _docs(rng, 4, WORDS)]
        m = VocabNoveltyMaintainer(str(tmp_path / "replay"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        before = _state(m, spark)
        # checkpoint-restart replay of the LAST batch
        m.process_batch(_df(spark, batches[1]), 1)
        assert _state(m, spark) == before

    def test_novelty_curve(self, spark, tmp_path):
        m = VocabNoveltyMaintainer(str(tmp_path / "curve"))
        m.process_batch(_df(spark, [("alpha beta",)]), 0)
        m.process_batch(_df(spark, [("beta gamma delta",)]), 1)
        m.process_batch(_df(spark, [("alpha beta",)]), 2)  # nothing new
        curve = {
            r["batch"]: (r["n_new"], r["vocab_after"])
            for r in m.novelty_curve(spark).collect()
        }
        assert curve == {0: (2, 2), 1: (2, 4)}
        assert m.vocab_size(spark) == 4

    def test_run_stream_e2e(self, spark, tmp_path):
        feed = str(tmp_path / "feed")
        _df(spark, [("alpha beta gamma",)]).write.mode("append").parquet(feed)
        _df(spark, [("gamma delta",)]).write.mode("append").parquet(feed)
        m = VocabNoveltyMaintainer(str(tmp_path / "stream"))
        stream = (
            spark.readStream.schema("text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(feed)
        )
        q = m.run_stream(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        st = _state(m, spark)
        assert {w: c for w, (c, _) in st.items()} == {
            "alpha": 1, "beta": 1, "gamma": 2, "delta": 1,
        }
        assert m.vocab_size(spark) == 4
