"""PQ drift closed loop (VERDICT r07 #7): planted distribution shift →
monitor trips → retrain into a new codebook generation → recall
recovers. Deterministic (seeded data, md5 sample, seeded k-means)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.pq import build_pq, encode_with, pq_search
from snowflake_cdc_spark.streaming.pq_maintenance import PqIndexMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

DIM, M, K = 8, 4, 16
SCHEMA = "vec_id long, embedding array<double>"
Q_SCHEMA = "query_id long, query_vec array<double>"


def _dist_a(rng, n, start_id):
    """Distribution A: energy in the first 4 dims."""
    x = np.concatenate(
        [rng.normal(0, 1, (n, 4)), rng.normal(0, 0.05, (n, 4))], axis=1
    )
    return [(start_id + i, [float(v) for v in x[i]]) for i in range(n)]


def _dist_b(rng, n, start_id):
    """Distribution B (the shift): last 4 dims offset to +6 — a single
    far-away quadrant, so A-trained codebooks quantize EVERY B vector to
    the same codeword (ADC carries zero signal among B candidates) while
    the B-trained generation spreads them."""
    x = np.concatenate(
        [rng.normal(0, 0.05, (n, 4)), rng.normal(6, 1.5, (n, 4))], axis=1
    )
    return [(start_id + i, [float(v) for v in x[i]]) for i in range(n)]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    corpus_a = _dist_a(rng, 200, 0)
    batch_a = _dist_a(rng, 100, 1000)
    batch_b = _dist_b(rng, 150, 2000)
    queries = [
        (qid, vec) for qid, vec in _dist_b(rng, 10, 9000)
    ]
    return corpus_a, batch_a, batch_b, queries


def _truth(corpus_rows, queries, k=5):
    """Exact cosine top-k with pq_search's rounding + tie rule."""
    ids = np.array([r[0] for r in corpus_rows])
    X = np.array([r[1] for r in corpus_rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for qid, qv in queries:
        q = np.array(qv)
        sims = np.round(Xn @ (q / np.linalg.norm(q)), 4)
        order = sorted(zip(-sims, ids))[:k]
        out[qid] = {int(i) for _, i in order}
    return out


def _recall(result_rows, truth, k=5):
    got = {}
    for r in result_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    return sum(
        len(got.get(q, set()) & t) / k for q, t in truth.items()
    ) / len(truth)


def test_drift_trips_retrains_and_recall_recovers(spark, data):
    corpus_a, batch_a, batch_b, queries = data
    qdf = spark.createDataFrame(queries, Q_SCHEMA)
    truth = _truth(corpus_a + batch_a + batch_b, queries)

    index = build_pq(
        spark.createDataFrame(corpus_a, SCHEMA), m=M, k=K, seed=11
    )

    # --- no action (monitor-only): batch B encoded with stale books ---
    stale = index.codes
    for rows in (batch_a, batch_b):
        stale = stale.unionByName(
            encode_with(index, spark.createDataFrame(rows, SCHEMA))
        )
    index.codes = stale
    before = pq_search(index, qdf, k=5, shortlist=25).collect()
    recall_before = _recall(before, truth)

    # --- closed loop -------------------------------------------------
    index2 = build_pq(
        spark.createDataFrame(corpus_a, SCHEMA), m=M, k=K, seed=11
    )
    maint = PqIndexMaintainer(index2, threshold_ratio=2.0)
    maint.process_batch(spark.createDataFrame(batch_a, SCHEMA), 1)
    assert not maint.rebuilds, "same-distribution batch must not trip"
    maint.process_batch(spark.createDataFrame(batch_b, SCHEMA), 2)
    assert maint.rebuilds and maint.rebuilds[0][0] == 2, "shift must trip"
    assert len(maint.versions) == 2

    after = maint.search(qdf, k=5, shortlist=25).collect()
    recall_after = _recall(after, truth)
    assert recall_after > recall_before + 0.2, (
        f"recall must recover: before={recall_before} after={recall_after}"
    )
    assert recall_after >= 0.8, f"recovered recall too low: {recall_after}"


def test_foreachbatch_stream_trips_rebuild(spark, data, tmp_path):
    """The same loop through a REAL availableNow foreachBatch stream."""
    corpus_a, batch_a, batch_b, _ = data
    feed = str(tmp_path / "feed")
    df_a = spark.createDataFrame(batch_a, SCHEMA)
    df_b = spark.createDataFrame(batch_b, SCHEMA)
    df_a.coalesce(1).write.mode("append").parquet(feed)
    df_b.coalesce(1).write.mode("append").parquet(feed)

    index = build_pq(
        spark.createDataFrame(corpus_a, SCHEMA), m=M, k=K, seed=11
    )
    maint = PqIndexMaintainer(index, threshold_ratio=2.0)
    stream = (
        spark.readStream.schema(df_a.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    q = maint.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    # whatever order the files arrived in, the B batch must have tripped
    # a rebuild against A-trained codebooks
    assert maint.rebuilds, "planted shift must trip through foreachBatch"
    total = sum(c.count() for c in maint.codes)
    assert total == len(corpus_a) + len(batch_a) + len(batch_b)


def test_compaction_collapses_generations(spark, data):
    """compact() re-encodes everything through the newest codebooks and
    collapses to one generation; B-query recall stays recovered (the
    newest books were trained on B) — only A-side codes change quality,
    and the exact re-rank keeps results sane."""
    corpus_a, batch_a, batch_b, queries = data
    qdf = spark.createDataFrame(queries, Q_SCHEMA)
    truth = _truth(corpus_a + batch_a + batch_b, queries)

    index = build_pq(
        spark.createDataFrame(corpus_a, SCHEMA), m=M, k=K, seed=11
    )
    maint = PqIndexMaintainer(index, threshold_ratio=2.0)
    maint.process_batch(spark.createDataFrame(batch_a, SCHEMA), 1)
    maint.process_batch(spark.createDataFrame(batch_b, SCHEMA), 2)
    assert len(maint.versions) == 2
    recall_two_gen = _recall(maint.search(qdf, k=5, shortlist=25).collect(), truth)

    collapsed = maint.compact()
    assert collapsed == 2 and len(maint.versions) == 1
    total = maint.codes[0].count()
    assert total == len(corpus_a) + len(batch_a) + len(batch_b)
    recall_compacted = _recall(
        maint.search(qdf, k=5, shortlist=25).collect(), truth
    )
    assert recall_compacted >= recall_two_gen - 0.1, (
        f"compaction must not destroy recall: {recall_two_gen} -> "
        f"{recall_compacted}"
    )


def test_same_generation_redelivery_is_newest_wins(spark):
    """An id re-arriving WITHIN one codebook generation must
    deterministically keep its newest vector — search() and compact()
    see exactly one row per id (the equal-__gen row_number tie would
    otherwise break by partition layout)."""
    rng = np.random.RandomState(7)
    base = spark.createDataFrame(_dist_a(rng, 64, 0), SCHEMA)
    idx = build_pq(base, m=M, k=K)
    maint = PqIndexMaintainer(idx, threshold_ratio=1e9)  # never trips

    old_vec = [float(v) for v in np.linspace(0.1, 0.8, DIM)]
    new_vec = [float(v) for v in -np.linspace(0.1, 0.8, DIM)]
    maint.process_batch(spark.createDataFrame([(500, old_vec)], SCHEMA), 1)
    maint.process_batch(spark.createDataFrame([(500, new_vec)], SCHEMA), 2)
    assert len(maint.versions) == 1  # same generation throughout

    rows = maint.codes[0].filter(F.col("vec_id") == 500).collect()
    assert len(rows) == 1
    assert list(rows[0]["embedding"]) == pytest.approx(new_vec)

    q = spark.createDataFrame([(0, new_vec)], Q_SCHEMA)
    hits = maint.search(q, k=1, shortlist=16).collect()
    assert hits[0]["vec_id"] == 500 and hits[0]["sim"] == pytest.approx(1.0)

    maint.compact()
    rows = maint.codes[0].filter(F.col("vec_id") == 500).collect()
    assert len(rows) == 1
    assert list(rows[0]["embedding"]) == pytest.approx(new_vec)
