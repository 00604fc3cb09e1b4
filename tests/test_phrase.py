"""Exact phrase search (operators/phrase.py): planted overlap,
repeated-word, boundary and absence semantics."""

from __future__ import annotations

from snowflake_cdc_spark.operators.phrase import phrase_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _got(df):
    return {
        (r.phrase, r.doc_id): (r.n_occ, r.first_pos) for r in df.collect()
    }


class TestPhraseSearch:
    def test_basic_and_multiple_occurrences(self, spark):
        docs = _docs(
            spark,
            [
                (1, "the quick fox jumps the quick fox sleeps"),
                (2, "quick the fox"),  # words present, order wrong
                (3, "the quick end"),
            ],
        )
        got = _got(phrase_search(docs, {"p": "the quick fox"}))
        assert got == {("p", 1): (2, 1)}

    def test_overlapping_repeated_word(self, spark):
        # "a a a a" contains "a a" at starts 1,2,3 — overlaps all count
        docs = _docs(spark, [(1, "a a a a"), (2, "b a a b")])
        got = _got(phrase_search(docs, {"aa": "a a"}))
        assert got == {("aa", 1): (3, 1), ("aa", 2): (1, 2)}

    def test_boundaries_and_case_and_punct(self, spark):
        # tokenization is [a-z]+ over lower(): punctuation splits,
        # case folds; phrase at the exact end of the doc matches
        docs = _docs(spark, [(1, "X! Hello, WORLD."), (2, "hello worldly")])
        got = _got(phrase_search(docs, {"hw": "hello world"}))
        assert got == {("hw", 1): (1, 2)}

    def test_multi_phrase_single_pass(self, spark):
        docs = _docs(spark, [(1, "a b c a b"), (2, "c c c")])
        got = _got(phrase_search(docs, {"ab": "a b", "cc": "c c"}))
        assert got == {("ab", 1): (2, 1), ("cc", 2): (2, 1)}

    def test_absent_phrase_yields_no_rows(self, spark):
        docs = _docs(spark, [(1, "a b c")])
        assert phrase_search(docs, {"zz": "z z"}).count() == 0
