"""k-core decomposition (operators/kcore.py): planted-graph exactness,
multi-round cascade, early-exit == full-unroll fixpoint semantics, and
a brute-force peeling fuzz."""

from __future__ import annotations

import pytest

from snowflake_cdc_spark.operators.kcore import kcore


def _edges(spark, und_pairs):
    """Undirected pair list -> both-direction, distinct, no self-loop."""
    both = []
    for a, b in und_pairs:
        both.append((a, b))
        both.append((b, a))
    return spark.createDataFrame(sorted(set(both)), "src long, dst long")


def _brute_kcore(und_pairs, k):
    """Reference peeling on adjacency sets."""
    adj = {}
    for a, b in set(und_pairs) | {(b, a) for a, b in und_pairs}:
        if a != b:
            adj.setdefault(a, set()).add(b)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(vs) for n, vs in adj.items()}


class TestKcore:
    def test_pendant_chain_cascades_over_rounds(self, spark):
        # triangle 1-2-3 with a pendant chain 3-4-5-6: each chain node
        # peels only after its outer neighbor went — a genuinely
        # multi-round cascade, not a single filter
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=2).collect()}
        assert got == {(1, 2), (2, 2), (3, 2)}

    def test_k3_keeps_only_the_clique(self, spark):
        # K4 {1,2,3,4} + a triangle {4,5,6} hanging off it: the 3-core
        # is exactly the K4 (the triangle's nodes have deg 2 inside it)
        k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
        pairs = k4 + [(4, 5), (4, 6), (5, 6)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=3).collect()}
        assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}

    def test_empty_core(self, spark):
        # a tree has no 2-core
        pairs = [(1, 2), (2, 3), (2, 4), (4, 5)]
        assert kcore(_edges(spark, pairs), k=2).count() == 0

    def test_max_rounds_hit_equals_bounded_peel(self, spark):
        # chain 1..6 + triangle: full 2-core needs 3 peel rounds; with
        # max_rounds=1 the result must be EXACTLY what a 1-round oracle
        # unroll computes: d_1 (degrees over the ORIGINAL edge set)
        # filtered to >= k — NOT a recomputed post-peel degree pass,
        # which would be a hidden extra peel stage (ADVICE r05)
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=2, max_rounds=1).collect()}
        adj = {n: set() for n in range(1, 7)}
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        expect = {(n, len(vs)) for n, vs in adj.items() if len(vs) >= 2}
        assert got == expect

    def test_max_rounds_two_equals_two_round_unroll(self, spark):
        # same graph, max_rounds=2: the oracle's d_2 runs over the
        # round-1 survivors {1,2,3,4,5}; node 5's degree drops to 1
        # (neighbor 6 peeled), so round 2 peels it and the output is
        # d_2-filtered — degrees over n_1, never a third degree pass
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        got = {(r.node, r.deg) for r in kcore(_edges(spark, pairs), k=2, max_rounds=2).collect()}
        assert got == {(1, 2), (2, 2), (3, 3), (4, 2)}

    @pytest.mark.parametrize("seed", [3, 17])
    def test_fuzz_vs_brute_peeling(self, spark, seed):
        import random

        rng = random.Random(seed)
        nodes = list(range(1, 25))
        pairs = set()
        for _ in range(55):
            a, b = rng.sample(nodes, 2)
            pairs.add((min(a, b), max(a, b)))
        for k in (2, 3, 4):
            got = {(r.node, r.deg) for r in kcore(_edges(spark, sorted(pairs)), k=k).collect()}
            expect = {(n, d) for n, d in _brute_kcore(pairs, k).items()}
            assert got == expect, f"k={k} seed={seed}"
