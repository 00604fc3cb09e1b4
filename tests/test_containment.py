"""Directed containment join (operators/setsim.py::containment_join):
planted sub/superset direction semantics, integer threshold boundaries,
and a brute-force completeness/soundness fuzz."""

from __future__ import annotations

import random

import pytest

from snowflake_cdc_spark.operators.setsim import containment_join


def _toks(spark, sets):
    """sets: {doc_id: iterable of tokens} -> (doc_id, tok) postings."""
    rows = [(d, t) for d, ts in sets.items() for t in sorted(set(ts))]
    return spark.createDataFrame(rows, "doc_id long, tok string")


def _brute(sets, tn, td):
    out = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                ni = len(set(sa) & set(sb))
                if td * ni >= tn * len(set(sa)):
                    out.add((a, b, ni, len(set(sa))))
    return out


class TestContainment:
    def test_direction_is_asymmetric(self, spark):
        sets = {1: ["a", "b"], 2: ["a", "b", "c", "d", "e", "f"]}
        got = {
            (r.sub_doc, r.sup_doc, r.n_inter, r.n_sub)
            for r in containment_join(_toks(spark, sets), 9, 10).collect()
        }
        # 1 ⊂ 2: containment(1→2) = 1.0; containment(2→1) = 2/6 < .9
        assert got == {(1, 2, 2, 2)}

    def test_integer_threshold_boundary(self, spark):
        # |A| = 10, inter = 9: 10*9 >= 9*10 holds EXACTLY at t = 9/10
        a = [f"t{i}" for i in range(10)]
        sets = {1: a, 2: a[:9] + ["other", "more", "stuff"]}
        got = {
            (r.sub_doc, r.sup_doc)
            for r in containment_join(_toks(spark, sets), 9, 10).collect()
        }
        assert (1, 2) in got
        # inter = 8 of 10 fails
        sets2 = {1: a, 2: a[:8] + ["x", "y", "z", "w"]}
        got2 = {
            (r.sub_doc, r.sup_doc)
            for r in containment_join(_toks(spark, sets2), 9, 10).collect()
        }
        assert (1, 2) not in got2

    def test_jaccard_blind_spot_is_covered(self, spark):
        # tiny doc inside a huge one: Jaccard 3/50 but containment 1.0
        big = [f"w{i}" for i in range(50)]
        sets = {1: big[:3], 2: big}
        got = {
            (r.sub_doc, r.sup_doc)
            for r in containment_join(_toks(spark, sets), 10, 10).collect()
        }
        assert got == {(1, 2)}

    @pytest.mark.parametrize("seed", [2, 19])
    def test_fuzz_vs_brute(self, spark, seed):
        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(30)]
        sets = {}
        for d in range(14):
            sets[d] = rng.sample(vocab, rng.randint(2, 12))
        # plant near-supersets (the regime prefix filtering must not lose)
        sets[100] = sets[0] + ["extra1", "extra2"]
        sets[101] = sets[1][: max(1, len(sets[1]) - 1)]
        for tn, td in ((9, 10), (7, 10), (10, 10)):
            got = {
                (r.sub_doc, r.sup_doc, r.n_inter, r.n_sub)
                for r in containment_join(_toks(spark, sets), tn, td).collect()
            }
            assert got == _brute(sets, tn, td), (tn, td)
