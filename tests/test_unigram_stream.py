"""Streaming unigram-tokenizer maintainer (streaming/unigram_stream.py):
exact word-count state parity over arbitrary splits, replay idempotence,
and the derived tokenizer reads (vocab + segmentation) matching the
one-shot batch build over the same documents."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators import unigram
from snowflake_cdc_spark.streaming.unigram_stream import UnigramVocabMaintainer

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "alphabet", "better", "gam", "d", "ep",
]


def _docs(rng, n, vocab):
    return [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))),)
        for _ in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "text string")


def _expected(batches):
    exp = {}
    for rows in batches:
        for (text,) in rows:
            for w in text.split():
                exp[w] = exp.get(w, 0) + 1
    return exp


def _state(m, spark):
    return {r["w"]: r["cnt"] for r in m.state(spark).collect()}


class TestUnigramVocabMaintainer:
    @pytest.mark.parametrize("seed", [7, 41])
    def test_state_parity_over_arbitrary_splits(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        batches = [
            _docs(rng, rng.randint(2, 8), WORDS[: 4 + b * 3])
            for b in range(3)
        ]
        m = UnigramVocabMaintainer(str(tmp_path / f"s{seed}"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        assert _state(m, spark) == _expected(batches)

    def test_replay_is_idempotent(self, spark, tmp_path):
        rng = random.Random(3)
        batches = [_docs(rng, 4, WORDS[:5]), _docs(rng, 4, WORDS)]
        m = UnigramVocabMaintainer(str(tmp_path / "replay"))
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)
        before = _state(m, spark)
        m.process_batch(_df(spark, batches[1]), 1)  # redelivery
        assert _state(m, spark) == before

    def test_derived_vocab_and_segmentation_match_batch_build(
        self, spark, tmp_path
    ):
        # stream in 3 batches, then retrain: the derived vocab and
        # segmentation must EQUAL the one-shot batch build over the
        # concatenated documents (same operators/unigram.py code path,
        # same data -> exact equality)
        rng = random.Random(19)
        batches = [_docs(rng, 6, WORDS[: 5 + b * 3]) for b in range(3)]
        m = UnigramVocabMaintainer(str(tmp_path / "derived"), vocab_size=16)
        for b, rows in enumerate(batches):
            m.process_batch(_df(spark, rows), b)

        all_docs = _df(spark, [r for rows in batches for r in rows])
        wt = (
            all_docs.select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit("[a-z]+"), 0
                    )
                ).alias("w")
            )
            .filter(F.length("w") <= unigram.MAX_WLEN)
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        batch_vocab = unigram.costed_vocab(
            spark, unigram.piece_counts(wt), 16
        )
        stream_vocab = m.vocab(spark)
        assert sorted(map(tuple, stream_vocab.collect())) == sorted(
            map(tuple, batch_vocab.collect())
        )

        batch_seg = unigram.viterbi_segment(wt, batch_vocab)
        stream_seg = m.segmented(spark)
        assert sorted(map(tuple, stream_seg.collect())) == sorted(
            map(tuple, batch_seg.collect())
        )
        # every word segments (single-char closure): cost < INF
        assert all(
            r["comp"] // unigram.SCALE < unigram.INF
            for r in stream_seg.collect()
        )

    def test_available_now_stream(self, spark, tmp_path):
        # drive through a REAL availableNow stream (file source)
        src = tmp_path / "src"
        _df(spark, [("alpha beta beta",), ("gamma alpha",)]).write.parquet(
            str(src)
        )
        m = UnigramVocabMaintainer(str(tmp_path / "stream"))
        docs = spark.readStream.schema("text string").parquet(str(src))
        q = m.run_stream(docs, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        assert _state(m, spark) == {"alpha": 2, "beta": 2, "gamma": 1}
