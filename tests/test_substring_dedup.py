"""Exact-substring duplicate-span detection (operators/substring_dedup.py):
planted overlapping-span corpora + fuzz equivalence vs an independent
Python reference, and the winnowing scale path's soundness/completeness
contract (Lee et al. ExactSubstr semantics; Schleimer et al. winnowing)."""

from __future__ import annotations

import hashlib

from conftest import prop_settings
from hypothesis import example, given
from hypothesis import strategies as st

from snowflake_cdc_spark.operators.substring_dedup import (
    duplicate_spans,
    duplicate_spans_minimized,
    minimizer_anchors,
)

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow


def _brute(docs: dict[int, list[str]], k: int) -> dict[int, dict]:
    """Independent reference: position-coverage of non-first duplicated
    k-windows, maximal runs of covered positions = spans."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, ws in docs.items():
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p : p + k]), []).append((d, p))
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for lst in occ.values():
        if len(lst) >= 2:
            for d, p in sorted(lst)[1:]:
                covered[d].update(range(p, p + k))
    out = {}
    for d, ws in docs.items():
        spans: list[list[int]] = []
        for p in sorted(covered[d]):
            if spans and p == spans[-1][1] + 1:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        blob = ",".join(f"{s}:{e}" for s, e in spans)
        out[d] = {
            "n_words": len(ws),
            "n_spans": len(spans),
            "n_dup_words": sum(e - s + 1 for s, e in spans),
            "spans_md5": hashlib.md5(blob.encode()).hexdigest(),
            "covered": covered[d],
        }
    return out


def _df(spark, docs: dict[int, list[str]]):
    return spark.createDataFrame(
        [(d, " ".join(ws)) for d, ws in docs.items()],
        "doc_id long, text string",
    )


def _rows(df):
    return {
        r.doc_id: (r.n_words, r.n_spans, r.n_dup_words, r.spans_md5)
        for r in df.collect()
    }


def _assert_matches_brute(spark, docs, k):
    got = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=k))
    want = _brute(docs, k)
    assert got == {
        d: (v["n_words"], v["n_spans"], v["n_dup_words"], v["spans_md5"])
        for d, v in want.items()
    }


class TestExactLane:
    def test_planted_overlapping_spans(self, spark):
        # doc 2 repeats doc 1's words 0-7 at offset 2 (arbitrary
        # boundary — a fixed 4-word chunk grid would misalign), doc 4 is
        # an exact copy of doc 1, doc 5 holds TWO disjoint repeats that
        # must come out as separate spans
        docs = {
            1: "a b c d e f g h i j k l".split(),
            2: "x y a b c d e f g h z w".split(),
            3: "p q r s t u v w1 w2 w3".split(),
            4: "a b c d e f g h i j k l".split(),
            5: "a b c d u1 u2 u3 i j k l u4".split(),
        }
        got = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=4))
        # keeper doc 1 loses nothing; doc 2's span is words 2..9 (8 wide)
        assert got[1][1:3] == (0, 0)
        assert got[2][1:3] == (1, 8)
        assert got[3][1:3] == (0, 0)
        assert got[4][1:3] == (1, 12)
        assert got[5][1:3] == (2, 8)
        _assert_matches_brute(spark, docs, k=4)

    def test_intra_doc_repeat(self, spark):
        # the same 4 words twice INSIDE one doc: second occurrence is
        # removable (first-occurrence keeper is position 0 of the same doc)
        docs = {7: "m n o p q r m n o p s t".split()}
        got = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=4))
        assert got[7] == (12, 1, 4, _brute(docs, 4)[7]["spans_md5"])
        _assert_matches_brute(spark, docs, k=4)

    def test_doc_shorter_than_k_reports_zero(self, spark):
        docs = {1: "a b".split(), 2: "a b".split(), 3: "a b c d e".split()}
        got = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=4))
        assert got[1] == (2, 0, 0, _brute(docs, 4)[1]["spans_md5"])
        assert got[2][1] == 0

    @prop_settings(15)
    @given(
        docs=st.dictionaries(
            st.integers(0, 7),
            st.lists(
                st.sampled_from("a b c d e".split()), min_size=1, max_size=14
            ),
            min_size=1,
            max_size=6,
        ),
        k=st.integers(2, 4),
    )
    # adjacent-window merge boundary: spans [0..2],[3..5] from k=3
    # windows at pos 0 and 3 must merge into ONE six-word span
    @example(docs={0: list("aabcab"), 1: list("aabcab")}, k=3)
    def test_matches_bruteforce(self, spark, docs, k):
        _assert_matches_brute(spark, docs, k)


class TestMinimizedLane:
    def test_planted_long_span_identical_to_exact(self, spark):
        # 12-word repeat >= k+w-1: the winnowed lane must report it
        long = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12".split()
        docs = {
            1: long + ["t1", "t2"],
            2: ["u1", "u2"] + long,
            3: "v1 v2 v3 v4 v5 v6 v7 v8".split(),
        }
        exact = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=4))
        mini = _rows(
            duplicate_spans_minimized(_df(spark, docs), "doc_id", "text", k=4, w=3)
        )
        assert mini == exact
        assert mini[2][1:3] == (1, 12)

    @prop_settings(12)
    @given(
        docs=st.dictionaries(
            st.integers(0, 5),
            st.lists(
                st.sampled_from("a b c".split()), min_size=1, max_size=16
            ),
            min_size=1,
            max_size=5,
        ),
    )
    def test_soundness_and_long_span_completeness(self, spark, docs):
        k, w = 3, 3
        want = _brute(docs, k)
        mini = duplicate_spans_minimized(
            _df(spark, docs), "doc_id", "text", k=k, w=w
        ).collect()
        got_cov = {}
        # recompute per-doc covered positions from the reported counts by
        # re-deriving spans: spans_md5 is opaque, so assert on counts +
        # the coverage-subset via a second exact run on the SAME corpus
        exact = _rows(duplicate_spans(_df(spark, docs), "doc_id", "text", k=k))
        for r in mini:
            got_cov[r.doc_id] = (r.n_spans, r.n_dup_words)
            # soundness: never report more duplicated words than exact
            assert r.n_dup_words <= exact[r.doc_id][2]
        # completeness: every non-first copy of a >= k+w-1 repeat is fully
        # covered -> its doc's minimized n_dup_words reaches the brute
        # coverage that comes from long repeats alone
        occ = {}
        for d, ws in docs.items():
            L = k + w - 1
            for p in range(len(ws) - L + 1):
                occ.setdefault(tuple(ws[p : p + L]), []).append((d, p))
        long_cov = {d: set() for d in docs}
        for lst in occ.values():
            if len(lst) >= 2:
                for d, p in sorted(lst)[1:]:
                    long_cov[d].update(range(p, p + k + w - 1))
        for d, need in long_cov.items():
            if need:
                assert got_cov[d][1] >= len(need)

    def test_anchor_volume_is_sublinear(self, spark):
        # winnowing's point: selected anchors << total windows
        ws = [f"w{i}" for i in range(200)]
        docs = {1: ws, 2: ws[50:150]}
        df = _df(spark, docs)
        n_anchors = minimizer_anchors(df, "doc_id", "text", k=4, w=8).count()
        n_windows = (200 - 3) + (100 - 3)
        assert n_anchors < n_windows / 2
