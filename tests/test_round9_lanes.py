"""Round-9 lane invariants beyond the oracle hash gate:

- the relational-centroid k-means path (operators/ivf_relational.py)
  is hash-interchangeable with the plan-literal kmeans_exact path at
  the same (k, rounds) — same cells, same distances, same centroids;
- the fixed md5 panel is the same set regardless of input layout;
- q192b mutual pairs are symmetric-by-construction and each member
  really is the other's probed top-1.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.ivf_relational import (
    relational_ivf_topk,
    relational_kmeans_fit,
)
from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit
from snowflake_cdc_spark.queries import _t
from snowflake_cdc_spark.queries_round9_ext import _md5_panel, q192b, q235

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


def test_relational_kmeans_matches_literal_path(spark):
    emb = _t(spark, SF, "embeddings")
    lit_centroids, lit_assigned = kmeans_fit(emb, k=8, rounds=2)
    rel_centroids, rel_assigned = relational_kmeans_fit(emb, k=8, rounds=2)
    rel_c = {
        r["cell"]: list(r["qv"]) for r in rel_centroids.collect()
    }
    assert rel_c == {c: list(v) for c, v in lit_centroids}
    lit_rows = {
        r["vec_id"]: (r["cell"], r["dist"]) for r in lit_assigned.collect()
    }
    rel_rows = {
        r["vec_id"]: (r["cell"], r["dist"]) for r in rel_assigned.collect()
    }
    assert rel_rows == lit_rows


def test_relational_topk_matches_ivf_exact(spark):
    from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search

    emb = _t(spark, SF, "embeddings")
    lit_centroids, lit_assigned = kmeans_fit(emb, k=8, rounds=2)
    queries = lit_assigned.select(F.col("vec_id").alias("query_id"), "qv").filter(
        F.col("query_id") % 50 == 0
    )
    lit = ivf_exact_search(
        lit_centroids, lit_assigned.select("vec_id", "qv", "cell"), queries,
        k=3, nprobe=4, dim=64,
    )
    rel_centroids, rel_assigned = relational_kmeans_fit(emb, k=8, rounds=2)
    rel = relational_ivf_topk(
        rel_centroids, rel_assigned.select("vec_id", "qv", "cell"),
        rel_assigned.select(F.col("vec_id").alias("query_id"), "qv").filter(
            F.col("query_id") % 50 == 0
        ),
        k=3, nprobe=4, dim=64,
    )
    key = lambda r: (r["query_id"], r["vec_id"], r["dist"])  # noqa: E731
    assert sorted(map(key, rel.collect())) == sorted(map(key, lit.collect()))


def test_md5_panel_layout_invariant(spark):
    emb = _t(spark, SF, "embeddings")
    a = [r["query_id"] for r in _md5_panel(emb).collect()]
    b = [
        r["query_id"]
        for r in _md5_panel(emb.repartition(7, "vec_id")).collect()
    ]
    assert a == b
    assert len(a) == 128 == len(set(a))


def test_q192b_pairs_are_mutual_top1(spark):
    emb = _t(spark, SF, "embeddings")
    n = emb.count()
    k_cells = max(8, math.ceil(math.sqrt(n)))
    pairs = q192b(spark, SF).collect()
    assert pairs, "fixture should yield at least one mutual pair"
    assert all(p["vec_a"] < p["vec_b"] for p in pairs)

    centroids, assigned = relational_kmeans_fit(emb, k=k_cells, rounds=2)
    nn = relational_ivf_topk(
        centroids, assigned.select("vec_id", "qv", "cell"),
        assigned.select(F.col("vec_id").alias("query_id"), "qv"),
        k=1, nprobe=4, dim=64,
    )
    top1 = {r["query_id"]: r["vec_id"] for r in nn.collect()}
    for p in pairs:
        assert top1[p["vec_a"]] == p["vec_b"]
        assert top1[p["vec_b"]] == p["vec_a"]


def test_nb_classifier_separates_planted_classes(spark):
    """VERDICT r08 #4 'done' criterion: on a corpus whose classes use
    disjoint planted vocabularies, the NB filter classifies every
    held-out doc correctly, and the score sign tracks the class."""
    from snowflake_cdc_spark.operators.nb import nb_score, nb_train

    pos_words = "alpha beta gamma delta"
    neg_words = "omega sigma theta kappa"
    rows = []
    for i in range(40):
        label = i % 2 == 0
        rows.append((i, label, (pos_words if label else neg_words).split()))
    train = spark.createDataFrame(
        rows[:30], "doc_id int, pos boolean, ws array<string>"
    )
    test = spark.createDataFrame(
        rows[30:], "doc_id int, pos boolean, ws array<string>"
    )
    lr, k = nb_train(train)
    got = nb_score(test, lr, k).collect()
    assert len(got) == 10
    for r in got:
        assert r["pred_pos"] == r["pos"]
        assert (r["score_unat"] > 0) == r["pos"]


def test_q235_confusion_counts_match_split(spark):
    """The confusion matrix totals must equal the q210 test-split size."""
    from snowflake_cdc_spark.queries_round7_ext import q210

    out = q235(spark, SF).collect()
    total = sum(r["n_docs"] for r in out)
    split_rows = q210(spark, SF).collect()
    want = sum(r["n_docs"] for r in split_rows if r["split"] == "test")
    assert total == want


def test_q237_ess_bounds_and_consistency(spark):
    """ESS in [1, n_pool]; ratio consistent with ess/n; zero-weight tail
    bounded by the pool."""
    from snowflake_cdc_spark.queries_round9_ext import q237

    r = q237(spark, SF).collect()[0]
    assert 1000 <= r["ess_milli"] <= r["n_pool"] * 1000
    want_ratio = round(r["ess_milli"] * 1000 / r["n_pool"])
    assert abs(r["ess_ratio_ppm"] - want_ratio) <= 1
    assert 0 <= r["n_zero_weight"] < r["n_pool"]


def test_ess_degenerate_and_uniform_extremes(spark):
    """The ESS algebra itself: uniform weights -> ESS == n; one dominant
    weight -> ESS -> 1 (the q237 quantized form, driven directly)."""
    from pyspark.sql import functions as F

    def ess_milli(logws):
        pool = spark.createDataFrame(
            [(i, lw) for i, lw in enumerate(logws)], "doc_id int, logw bigint"
        )
        mx = pool.agg(F.max("logw").cast("bigint").alias("mxw"))
        wq = pool.crossJoin(F.broadcast(mx)).select(
            F.expr(
                "CAST(floor(exp(CAST(logw - mxw AS DOUBLE) / 1000000.0)"
                " * 1000.0 + 0.5) AS BIGINT)"
            ).alias("w")
        )
        r = wq.agg(
            F.sum("w").alias("s1"), F.sum(F.col("w") * F.col("w")).alias("s2")
        ).collect()[0]
        return round(r["s1"] * r["s1"] * 1000 / r["s2"])

    assert ess_milli([500_000] * 8) == 8000  # uniform: ESS == n
    # one doc 20 nats above the rest: everyone else quantizes to 0 weight
    assert ess_milli([20_000_000] + [0] * 7) == 1000


def test_q238_calibration_invariants(spark):
    """Probabilities in [0, 1e6]; empirical rate consistent with the
    band's pos counts; bands partition the q236 test split."""
    from snowflake_cdc_spark.queries_round9_ext import q236, q238

    cal = q238(spark, SF).collect()
    pr = q236(spark, SF).collect()
    assert len(cal) == 10
    assert sum(r["n_docs"] for r in cal) == sum(r["n_docs"] for r in pr)
    for r in cal:
        assert 0 <= r["mean_pred_ppm"] <= 1_000_000
        assert r["empirical_ppm"] == r["n_pos"] * 1_000_000 // r["n_docs"]
        assert r["gap_ppm"] == r["mean_pred_ppm"] - r["empirical_ppm"]
    # monotone banding: higher bands hold higher scores, so the mean
    # predicted probability must be non-decreasing across bands
    preds = [r["mean_pred_ppm"] for r in sorted(cal, key=lambda r: r["band"])]
    assert preds == sorted(preds)


def test_nb_score_keeps_zero_token_docs(spark):
    """A doc with no tokens scores prior-only instead of vanishing
    (the quality filter must keep-or-reject EVERY input row)."""
    from snowflake_cdc_spark.operators.nb import nb_score, nb_train

    train = spark.createDataFrame(
        [(0, True, ["alpha", "beta"]), (1, False, ["omega", "kappa"]),
         (2, True, ["alpha"]), (3, False, ["omega"])],
        "doc_id int, pos boolean, ws array<string>",
    )
    lr, k = nb_train(train)
    test = spark.createDataFrame(
        [(10, ["alpha"]), (11, [])], "doc_id int, ws array<string>"
    )
    got = {r["doc_id"]: r for r in nb_score(test, lr, k).collect()}
    assert set(got) == {10, 11}
    prior = k.first()["prior"]
    assert got[11]["score_unat"] == prior
    assert got[11]["pred_pos"] == (prior > 0)


def test_nb_train_rejects_single_class(spark):
    import pytest

    from snowflake_cdc_spark.operators.nb import nb_train

    train = spark.createDataFrame(
        [(0, True, ["alpha"]), (1, True, ["beta"])],
        "doc_id int, pos boolean, ws array<string>",
    )
    with pytest.raises(ValueError, match="both classes"):
        nb_train(train)
