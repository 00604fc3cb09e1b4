"""Production-assignment parity for SemDeDup (VERDICT r10 #4):
``semantic_dup_pairs_production`` (operators/ivf.py bounded-sample numpy
training + pandas_udf matmul assignment) must agree with the
oracle-exact relational assignment path (q244's
``relational_kmeans_fit``) on what matters — the DUP PAIRS it finds —
not on the cell labels themselves (two k-means runs never share
labels). The contract pinned here:

- **precision is structural**: any emitted pair passed the exact
  signed-grid integer-cosine threshold, so every pair from EITHER path
  is in the brute all-pairs ground truth (cells only prune, never
  invent);
- **recall parity**: on planted paraphrase clusters (the regime
  SemDeDup exists for — near-identical points that any reasonable
  cell partition co-locates) the production path's recall vs the
  brute ground truth is >= the exact path's minus a small slack, and
  both clear a hard floor.
"""

from __future__ import annotations

import math
import random

from snowflake_cdc_spark.operators.ivf_relational import relational_kmeans_fit
from snowflake_cdc_spark.operators.semdedup import (
    semantic_dup_pairs,
    semantic_dup_pairs_production,
)

DIM = 8
T_NUM, T_DEN = 19, 20
GRID = 1000


def _unit(rng):
    v = [rng.uniform(-1, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _fixture(rng, n_groups=40, group_size=3, n_noise=180):
    """{vec_id: vector}: n_groups planted paraphrase trios (cos > 0.999
    within a trio) in a sea of independent unit vectors."""
    vecs = {}
    vid = 0
    for _ in range(n_groups):
        base = _unit(rng)
        for j in range(group_size):
            vecs[vid] = [x + 0.0008 * j for x in base]
            vid += 1
    for _ in range(n_noise):
        vecs[vid] = _unit(rng)
        vid += 1
    return vecs


def _truth_pairs(vecs):
    """Brute ALL-pairs ground truth on the same float32/signed-grid
    integers the operator uses — no cell restriction."""
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    q = {
        i: [int(math.floor(f32(x) * GRID + 0.5)) for x in v]
        for i, v in vecs.items()
    }
    out = set()
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            dot = sum(x * y for x, y in zip(q[a], q[b]))
            na2 = sum(x * x for x in q[a])
            nb2 = sum(x * x for x in q[b])
            if dot > 0 and dot * dot * T_DEN * T_DEN >= T_NUM * T_NUM * na2 * nb2:
                out.add((a, b))
    return out


class TestSemDeDupProductionParity:
    def test_pairset_recall_vs_exact_assignment(self, spark):
        rng = random.Random(11)
        vecs = _fixture(rng)
        rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        truth = _truth_pairs(vecs)
        assert len(truth) >= 40 * 3  # every planted trio contributes 3 pairs

        k_cells = max(8, math.ceil(math.sqrt(len(vecs))))
        _, assigned = relational_kmeans_fit(emb, k=k_cells, rounds=2)
        exact = {
            (r.vec_a, r.vec_b)
            for r in semantic_dup_pairs(
                emb,
                t_num=T_NUM,
                t_den=T_DEN,
                assigned=assigned.select("vec_id", "cell"),
            ).collect()
        }
        prod = {
            (r.vec_a, r.vec_b)
            for r in semantic_dup_pairs_production(
                emb, t_num=T_NUM, t_den=T_DEN, n_cells=k_cells, seed=42
            ).collect()
        }
        # precision is structural: cells prune, the threshold is exact
        assert exact <= truth
        assert prod <= truth
        r_exact = len(exact & truth) / len(truth)
        r_prod = len(prod & truth) / len(truth)
        # recall parity: production within slack of exact, both over floor
        assert r_prod >= r_exact - 0.10, (r_prod, r_exact)
        assert r_prod >= 0.80, r_prod
        assert r_exact >= 0.80, r_exact
