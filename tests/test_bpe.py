"""Iterative BPE vocabulary training (operators/bpe.py): planted-corpus
exactness, greedy non-overlapping merge semantics, tie-breaks, and
early stop on a fully-merged vocabulary."""

from __future__ import annotations

from snowflake_cdc_spark.operators.bpe import train_bpe, word_frequencies


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_planted_corpus_learns_expected_merges(spark):
    # aaaa x2 -> (a,a) at 3 positions x 2 = 6 (overlapping positions
    # counted, Sennrich get_stats); ab x3 -> (a,b) = 3
    docs = _docs(spark, ["aaaa aaaa", "ab ab ab"])
    merges = train_bpe(word_frequencies(docs), rounds=8).collect()
    got = [(r.merge_round, r.left_s, r.right_s, r.merged, r.pair_count)
           for r in merges]
    # merge 1: (a,a) wins 6>3; greedy rewrite aaaa -> [aa, aa] (NOT
    # [aa, a, a] — the prefix-marker replace cannot overlap); merge 2:
    # (a,b)=3 beats (aa,aa)=2; merge 3: (aa,aa); then no pairs remain
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "a", "b", "ab", 3),
        (3, "aa", "aa", "aaaa", 2),
    ]


def test_tie_breaks_are_lexicographic(spark):
    docs = _docs(spark, ["xy yx"])
    merges = train_bpe(word_frequencies(docs), rounds=1).collect()
    assert [(r.left_s, r.right_s, r.pair_count) for r in merges] == [("x", "y", 1)]


def test_word_frequencies_reduce_corpus(spark):
    docs = _docs(spark, ["the cat the", "cat!"])
    wf = {r.word: r.cnt for r in word_frequencies(docs).collect()}
    assert wf == {"the": 2, "cat": 2}


def test_apply_bpe_uses_training_order_and_greedy_scan(spark):
    words = spark.createDataFrame(
        [("aaab", 1), ("b", 1), ("aaaa", 1)], "word string, cnt bigint"
    )
    merges = [(1, "a", "a", "aa", 0), (2, "aa", "a", "aaa", 0)]
    got = {r.word: r.n_bpe_tokens for r in
           __import__("snowflake_cdc_spark.operators.bpe", fromlist=["apply_bpe"])
           .apply_bpe(words, merges).collect()}
    # aaab: [a,a,a,b] -> merge1 greedy -> [aa,a,b] -> merge2 -> [aaa,b]
    # aaaa: -> [aa,aa] (greedy non-overlap) -> merge2 no match -> 2
    assert got == {"aaab": 2, "b": 1, "aaaa": 2}
