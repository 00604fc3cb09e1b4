"""IVF-Flat ANN: recall against brute force, nprobe=n_cells exactness,
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.ivf import build_ivf, ivf_search
from snowflake_cdc_spark.operators.similarity import cosine_topk
from snowflake_cdc_spark.sources.io import read_table
from tests.conftest import SF_SMOKE

K = 5
N_CELLS = 8


def _queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_full_probe_equals_brute_force(spark):
    """nprobe = n_cells degenerates to exact search — must equal the
    brute-force tier exactly."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    idx = build_ivf(emb, n_cells=N_CELLS)
    got = {
        (r.query_id, r.vec_id, r.sim)
        for r in ivf_search(idx, _queries(emb), k=K, nprobe=N_CELLS).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.sim)
        for r in cosine_topk(emb, _queries(emb), k=K).collect()
    }
    assert got == want


def test_partial_probe_recall(spark):
    """nprobe=3 of 8 cells: recall@5 must be meaningfully above the
    cell-fraction floor (random vectors are a worst case; planted
    near-dups would recall ~1.0)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    idx = build_ivf(emb, n_cells=N_CELLS)
    approx = ivf_search(idx, _queries(emb), k=K, nprobe=3).collect()
    exact = cosine_topk(emb, _queries(emb), k=K).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(1 for r in approx if r.vec_id in exact_sets.get(r.query_id, set()))
    recall = hits / max(len(exact), 1)
    assert recall >= 0.4, f"recall@{K} too low: {recall:.2f}"


def test_deterministic_given_seed(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = {
        (r.query_id, r.vec_id)
        for r in ivf_search(build_ivf(emb, seed=7), _queries(emb), k=3, nprobe=2).collect()
    }
    b = {
        (r.query_id, r.vec_id)
        for r in ivf_search(build_ivf(emb, seed=7), _queries(emb), k=3, nprobe=2).collect()
    }
    assert a == b
