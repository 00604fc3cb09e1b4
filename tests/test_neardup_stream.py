"""Streaming near-dup dedup (N2 on streams, round 3): the incremental
MinHash-LSH maintainer must (a) equal the batch pipeline on a single
batch, (b) catch cross-batch duplicates through the survivor index,
(c) hold the two streaming invariants — survivors pairwise non-dup,
every drop attributed to a surviving keeper — on multi-batch splits,
(d) replay batches idempotently, and (e) bound state under a horizon."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.dedup import minhash_lsh_pairs
from snowflake_cdc_spark.streaming.neardup_stream import NearDupMaintainer

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

BASE = "the quick brown fox jumps over the lazy dog again and again today"
SCHEMA = "doc_id long, text string"


def corpus_rows():
    rows = []
    for i in range(6):  # exact-duplicate group, ids 0..5
        rows.append((i, BASE))
    for i in range(10, 14):  # near-identical variants of BASE, j ≈ 0.85
        rows.append((i, BASE + f" variant token{i}"))
    for i in range(20, 24):  # unique docs
        rows.append((i, f"completely different content number {i} " * 3 + str(i)))
    return rows


def batch_pipeline_survivor_ids(df, threshold=0.8):
    """The q116 batch semantics: pairs → components → keep min-id."""
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=threshold)
    comp = connected_components(pairs, src="a", dst="b")
    dropped = {
        r["node"] for r in comp.filter(F.col("node") != F.col("component")).collect()
    }
    return {r["doc_id"] for r in df.select("doc_id").collect()} - dropped


def survivor_ids(m, df):
    return {r["doc_id"] for r in m.survivors(df).select("doc_id").collect()}


def test_single_batch_equals_batch_pipeline(spark, tmp_path):
    df = spark.createDataFrame(corpus_rows(), SCHEMA)
    m = NearDupMaintainer(str(tmp_path))
    m.process_batch(df, 0)
    assert survivor_ids(m, df) == batch_pipeline_survivor_ids(df)


def test_cross_batch_duplicate_dropped_via_index(spark, tmp_path):
    rows = corpus_rows()
    b0 = spark.createDataFrame([r for r in rows if r[0] < 10], SCHEMA)
    b1 = spark.createDataFrame([r for r in rows if r[0] >= 10], SCHEMA)
    late_copy = spark.createDataFrame([(99, BASE)], SCHEMA)
    m = NearDupMaintainer(str(tmp_path))
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    m.process_batch(late_copy, 2)
    drops = {r["id"]: (r["keeper"], r["via"]) for r in m.drops(spark).collect()}
    # the late exact copy must be attributed to the original survivor
    # (an exact copy collides in EVERY band — recall 1.0 by construction)
    assert drops[99] == (0, "index")
    # variants (j≈0.85): banded collision is deterministic-but-partial
    # (per-doc hit prob 1-(1-j^4)^2 ≈ 0.65 at 2×4 banding); every variant
    # the LSH *does* catch must be attributed to the indexed representative
    caught = [i for i in range(10, 14) if i in drops]
    assert len(caught) >= 2
    assert all(drops[i] == (0, "index") for i in caught)


def test_multi_batch_invariants(spark, tmp_path):
    rows = corpus_rows()
    all_df = spark.createDataFrame(rows, SCHEMA)
    m = NearDupMaintainer(str(tmp_path))
    for bid, lo in enumerate(range(0, len(rows), 5)):
        m.process_batch(spark.createDataFrame(rows[lo : lo + 5], SCHEMA), bid)

    surv = survivor_ids(m, all_df)
    # invariant 1: survivors are pairwise non-duplicate — re-running the
    # batch pair pipeline over the survivor set finds nothing
    surv_df = all_df.join(
        spark.createDataFrame([(i,) for i in surv], "doc_id long"), "doc_id"
    )
    assert minhash_lsh_pairs(surv_df, "doc_id", "text", threshold=0.8).count() == 0
    # invariant 2: every drop's keeper is a survivor (keeper chains are
    # depth 1 by construction: keepers come from the index or are the
    # kept component representative)
    drops = m.drops(spark).collect()
    assert drops and all(r["keeper"] in surv for r in drops)
    assert surv | {r["id"] for r in drops} == {r[0] for r in rows}


def test_replay_is_idempotent(spark, tmp_path):
    rows = corpus_rows()
    b0 = spark.createDataFrame(rows[:7], SCHEMA)
    b1 = spark.createDataFrame(rows[7:], SCHEMA)
    all_df = spark.createDataFrame(rows, SCHEMA)
    m = NearDupMaintainer(str(tmp_path))
    m.process_batch(b0, 0)
    m.process_batch(b1, 1)
    before = (survivor_ids(m, all_df), sorted(map(tuple, m.drops(spark).collect())))
    m.process_batch(b1, 1)  # checkpoint-restart replay of the last batch
    after = (survivor_ids(m, all_df), sorted(map(tuple, m.drops(spark).collect())))
    assert after == before


def test_transitive_chain_documented_divergence(spark, tmp_path):
    """a~b, b~c, a≁c across three batches keeps {a, c} (greedy first-wins)
    where the whole-corpus batch pipeline keeps {a} — the documented
    streaming contract."""
    w = [f"w{i}" for i in range(1, 18)]
    a = (1, " ".join(w[:14]))  # j(a,b)=12/15=0.8
    b = (2, " ".join(w))  # j(b,c)=12/15=0.8
    c = (3, " ".join(w[3:]))  # j(a,c)=9/15=0.6 < 0.7
    all_df = spark.createDataFrame([a, b, c], SCHEMA)
    assert batch_pipeline_survivor_ids(all_df, threshold=0.7) == {1}
    m = NearDupMaintainer(str(tmp_path), threshold=0.7)
    for bid, row in enumerate([a, b, c]):
        m.process_batch(spark.createDataFrame([row], SCHEMA), bid)
    assert survivor_ids(m, all_df) == {1, 3}


def test_horizon_bounds_match_window(spark, tmp_path):
    m = NearDupMaintainer(str(tmp_path), horizon_batches=1)
    m.process_batch(spark.createDataFrame([(1, BASE)], SCHEMA), 0)
    m.process_batch(
        spark.createDataFrame([(2, "some unrelated filler text here ok")], SCHEMA), 1
    )
    # batch 0 is outside the 1-batch horizon: the exact copy is KEPT
    m.process_batch(spark.createDataFrame([(3, BASE)], SCHEMA), 2)
    all_df = spark.createDataFrame(
        [(1, BASE), (2, "x"), (3, BASE)], SCHEMA
    )
    assert survivor_ids(m, all_df) == {1, 2, 3}


def test_run_stream_e2e(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = corpus_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    df.filter(F.col("doc_id") < 10).coalesce(1).write.parquet(src + "/f0")
    df.filter(F.col("doc_id") >= 10).coalesce(1).write.parquet(src + "/f1")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    m = NearDupMaintainer(str(tmp_path / "state"))
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    surv = survivor_ids(m, df)
    # exact group collapses to one survivor; variants collapse into the
    # BASE cluster or their own depending on batch split — invariants only
    assert minhash_lsh_pairs(
        df.join(spark.createDataFrame([(i,) for i in surv], "doc_id long"), "doc_id"),
        "doc_id",
        "text",
        threshold=0.8,
    ).count() == 0
    assert {r["keeper"] for r in m.drops(spark).collect()} <= surv
