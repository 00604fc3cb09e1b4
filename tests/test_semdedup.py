"""SemDeDup embedding-cluster dedup (operators/semdedup.py): planted
paraphrase cluster at the paper's 0.95 regime, keep-first survivorship,
and a seeded fuzz against a brute per-cell reference."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit
from snowflake_cdc_spark.operators.semdedup import (
    semantic_dup_pairs,
    semantic_survivors,
)

DIM = 8


def _emb(spark, vecs):
    """vecs: {vec_id: [float]*DIM} -> embeddings-shaped frame."""
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _unit(rng):
    v = [rng.uniform(-1, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _brute_pairs(vecs, cells, t_num, t_den, grid=1000):
    """Reference: per-cell quantized-integer cosine over all pairs."""
    # float32 round-trip first: Spark stores array<float>
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    q = {
        i: [int(math.floor(f32(x) * grid + 0.5)) for x in v]
        for i, v in vecs.items()
    }
    out = set()
    for a in sorted(vecs):
        for b in sorted(vecs):
            if a < b and cells[a] == cells[b]:
                dot = sum(x * y for x, y in zip(q[a], q[b]))
                na2 = sum(x * x for x in q[a])
                nb2 = sum(x * x for x in q[b])
                if dot > 0 and dot * dot * t_den * t_den >= t_num * t_num * na2 * nb2:
                    out.add((a, b, dot))
    return out


class TestSemDeDup:
    def test_planted_paraphrase_cluster(self, spark):
        rng = random.Random(5)
        base = _unit(rng)
        vecs = {}
        # three paraphrases: base + tiny aligned noise (cos > 0.999)
        for i in range(3):
            vecs[i] = [x + 0.001 * i for x in base]
        # far-away distinct docs
        for i in range(3, 12):
            vecs[i] = _unit(rng)
        df = _emb(spark, vecs)
        pairs = semantic_dup_pairs(
            df, t_num=19, t_den=20, k=2, rounds=2
        ).collect()
        got = {(r.vec_a, r.vec_b) for r in pairs}
        assert got == {(0, 1), (0, 2), (1, 2)}

    def test_keep_first_survivorship(self, spark):
        rng = random.Random(7)
        base = _unit(rng)
        vecs = {i: [x + 0.0005 * i for x in base] for i in range(3)}
        vecs[10] = _unit(rng)
        df = _emb(spark, vecs)
        pairs = semantic_dup_pairs(df, t_num=19, t_den=20, k=2, rounds=2)
        kept = {
            r.vec_id
            for r in semantic_survivors(df, pairs=pairs).collect()
        }
        assert kept == {0, 10}

    @pytest.mark.parametrize("seed", [3, 17])
    def test_fuzz_vs_brute_per_cell(self, spark, seed):
        rng = random.Random(seed)
        vecs = {}
        i = 0
        # a handful of paraphrase clusters + noise vectors
        for _ in range(4):
            base = _unit(rng)
            for _ in range(rng.randint(1, 3)):
                vecs[i] = [x + rng.uniform(-0.01, 0.01) for x in base]
                i += 1
        for _ in range(10):
            vecs[i] = _unit(rng)
            i += 1
        df = _emb(spark, vecs)
        _, assigned = kmeans_fit(df, k=3, rounds=2)
        cells = {r.vec_id: r.cell for r in assigned.collect()}
        got = {
            (r.vec_a, r.vec_b, r.dot)
            for r in semantic_dup_pairs(
                df, t_num=9, t_den=10, k=3, rounds=2
            ).collect()
        }
        assert got == _brute_pairs(vecs, cells, 9, 10)


def test_external_assignment_matches_internal_fit(spark):
    """Round 10: semantic_dup_pairs(assigned=...) with the SAME cell
    relation the internal kmeans_fit would build returns identical
    pairs — the seam q244 uses to swap in corpus-scaled relational
    k-means."""
    import random

    from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit
    from snowflake_cdc_spark.operators.semdedup import semantic_dup_pairs

    rng = random.Random(11)
    rows = [(i, _unit(rng)) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    _, assigned = kmeans_fit(emb, k=4, rounds=2)
    internal = semantic_dup_pairs(emb, t_num=1, t_den=4, k=4, rounds=2)
    external = semantic_dup_pairs(
        emb, t_num=1, t_den=4, assigned=assigned.select("vec_id", "cell")
    )
    assert sorted(map(tuple, internal.collect())) == sorted(
        map(tuple, external.collect())
    )


def test_dim_mismatch_fails_fast(spark):
    """ADVICE r06: a wrong ``dim`` must fail loudly, not silently NULL
    the unrolled dot/distance and corrupt the ranking. The guard lives
    at the operator boundary (_check_dim one-row probe — a when()
    wrapper around the 64-term unroll measured 4.5x on the pair scan),
    and the search window orders NULLs LAST as defense in depth."""
    from snowflake_cdc_spark.operators.ivf_exact import (
        _check_dim,
        _pair_dist,
    )

    df = spark.createDataFrame(
        [([1, 2, 3], [1, 2, 3])], "qa array<bigint>, qb array<bigint>"
    )
    # matching dim: exact distance, no guard in the expression
    assert df.select(_pair_dist("qa", "qb", 3).alias("d")).collect()[0].d == 0
    _check_dim(df, "qa", 3, "t")  # matching: no raise
    with pytest.raises(ValueError, match="dim=4"):
        _check_dim(df, "qa", 4, "t")
    _check_dim(df.filter("false"), "qa", 4, "t")  # empty: no probe row


def test_ivf_search_dim_mismatch_fails_fast(spark):
    from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit
    from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    centroids, assigned = kmeans_fit(emb, k=2, rounds=1)
    queries = assigned.select(
        F.col("vec_id").alias("query_id"), "qv"
    ).limit(2)
    with pytest.raises(ValueError, match="dim=5"):
        ivf_exact_search(centroids, assigned, queries, k=2, dim=5)


def test_semdedup_dim_mismatch_fails_fast(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0]), (4, [0.0, 0.99])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dim=3"):
        semantic_dup_pairs(emb, k=1, rounds=1, dim=3).collect()


def test_hot_cell_cap_bounds_pair_join(spark):
    """VERDICT r06 #1: a mega-cell (k-means can't split low-structure
    mass) is dropped by ``cell_cap`` with a logged count; surviving
    pairs are exactly the uncapped pairs minus the hot cell's —
    capped ⊆ uncapped, small-cell pairs untouched."""
    rng = random.Random(13)
    rows = []
    # hot cluster: 40 near-identical vectors around [1, 0]
    hot_ids = list(range(100, 140))
    for i in hot_ids:
        rows.append((i, [1.0 + rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01)]))
    # cold cluster: 8 near-identical vectors around [0, 1]
    cold_ids = list(range(200, 208))
    for i in cold_ids:
        rows.append((i, [rng.uniform(-0.01, 0.01), 1.0 + rng.uniform(-0.01, 0.01)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def pairs(cap):
        return {
            (r.vec_a, r.vec_b)
            for r in semantic_dup_pairs(
                emb, t_num=19, t_den=20, k=2, rounds=2, cell_cap=cap
            ).collect()
        }

    uncapped = pairs(None)
    capped = pairs(16)
    assert capped, "cold-cluster pairs must survive the cap"
    assert capped <= uncapped
    hot = set(hot_ids)
    assert all(a not in hot and b not in hot for a, b in capped)
    # the hot cluster's pairs were present before the cap
    assert any(a in hot and b in hot for a, b in uncapped)
