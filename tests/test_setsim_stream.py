"""Streaming exact set-similarity dedup (round 5): the incremental
Jaccard maintainer must (a) equal the batch pipeline on a single batch,
(b) catch EVERY cross-batch duplicate through the survivor posting
index (exactness: recall 1.0, unlike the banded MinHash lane),
(c) match a greedy Python reference on arbitrary multi-batch splits
(fuzzed), (d) replay batches idempotently, and (e) bound state under a
horizon."""

from __future__ import annotations

import os
import re

from conftest import prop_settings
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.setsim import (
    allpairs_jaccard_join,
    shingle_sets,
)
from snowflake_cdc_spark.streaming.setsim_stream import SetSimMaintainer

import pytest

# deep-soak lane: excluded from the default fast run (pytest.ini,
# VERDICT r11 item 7) — run with `pytest -m "" tests/`
pytestmark = pytest.mark.slow

SCHEMA = "doc_id long, text string"
BASE = "the quick brown fox jumps over the lazy dog again and again today"


def corpus_rows():
    rows = [(i, BASE) for i in range(4)]  # exact-dup group
    rows += [(i, BASE + f" tail token{i}") for i in range(10, 13)]  # near group
    rows += [
        (i, f"entirely different body of text number {i} with words " + "x " * 6)
        for i in range(20, 23)
    ]
    return rows


def _shset(text, n=3):
    # stdlib re lacks \p{L}; [a-z]+ == UNICODE_WORD on this ASCII fixture
    toks = re.findall("[a-z]+", text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _sim(a, b, tn, td):
    inter = len(a & b)
    return td * inter >= tn * len(a | b)


def greedy_reference(batches, tn=6, td=10, n=3):
    """Sequential survivor-index dedup in plain Python: per batch, drop
    docs matching any survivor (min keeper), then components over the
    remainder keep the min id."""
    surv: dict[int, set] = {}
    drops: dict[int, int] = {}
    for batch in batches:
        feats = {d: _shset(t, n) for d, t in batch}
        feats = {d: s for d, s in feats.items() if s}
        index_dropped = {}
        for d in sorted(feats):
            matches = [k for k, s in surv.items() if _sim(feats[d], s, tn, td)]
            if matches:
                index_dropped[d] = min(matches)
        remaining = {d: s for d, s in feats.items() if d not in index_dropped}
        # components over verified pairs
        parent = {d: d for d in remaining}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ds = sorted(remaining)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                if _sim(remaining[a], remaining[b], tn, td):
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for d in ds:
            r = find(d)
            if r != d:
                drops[d] = r
            else:
                surv[d] = remaining[d]
        drops.update(index_dropped)
    return surv, drops


def survivor_ids(m, df):
    return {r["doc_id"] for r in m.survivors(df).select("doc_id").collect()}


def batch_pipeline_survivor_ids(spark, df, tn=6, td=10):
    pairs = allpairs_jaccard_join(shingle_sets(df), tn, td)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    dropped = {
        r["node"] for r in comp.filter(F.col("node") != F.col("component")).collect()
    }
    return {r["doc_id"] for r in df.select("doc_id").collect()} - dropped


def test_single_batch_equals_batch_pipeline(spark, tmp_path):
    df = spark.createDataFrame(corpus_rows(), SCHEMA)
    m = SetSimMaintainer(str(tmp_path))
    m.process_batch(df, 0)
    assert survivor_ids(m, df) == batch_pipeline_survivor_ids(spark, df)


def test_cross_batch_duplicates_all_caught(spark, tmp_path):
    """Exactness: EVERY later doc similar to a survivor is dropped via
    the index — no banded-collision luck involved."""
    rows = corpus_rows()
    m = SetSimMaintainer(str(tmp_path))
    m.process_batch(spark.createDataFrame(rows[:1], SCHEMA), 0)  # keeper 0
    m.process_batch(spark.createDataFrame(rows[1:], SCHEMA), 1)
    drops = {r["id"]: (r["keeper"], r["via"]) for r in m.drops(spark).collect()}
    for i in (1, 2, 3):  # exact copies of doc 0 → index drop, keeper 0
        assert drops[i] == (0, "index")
    # near group shares j >= 0.6 with BASE? verify against the reference
    _, want = greedy_reference([rows[:1], rows[1:]])
    assert drops == {d: (k, drops[d][1]) for d, k in want.items()}


@prop_settings(8)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("a b c d e f".split()), min_size=3, max_size=10),
        min_size=2,
        max_size=10,
    ),
    cuts=st.lists(st.integers(1, 9), max_size=2),
)
def test_multibatch_matches_greedy_reference(spark, tmp_path_factory, texts, cuts):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    bounds = sorted({c for c in cuts if c < len(rows)})
    batches, lo = [], 0
    for c in bounds + [len(rows)]:
        if c > lo:
            batches.append(rows[lo:c])
            lo = c
    root = str(tmp_path_factory.mktemp("setsim"))
    m = SetSimMaintainer(root)
    for bid, b in enumerate(batches):
        m.process_batch(spark.createDataFrame(b, SCHEMA), bid)
    all_df = spark.createDataFrame(rows, SCHEMA)
    surv_ref, drops_ref = greedy_reference(batches)
    # docs with empty shingle sets always survive (below resolution)
    empty = {d for d, t in rows if not _shset(t)}
    assert survivor_ids(m, all_df) == set(surv_ref) | empty
    got_drops = {r["id"]: r["keeper"] for r in m.drops(spark).collect()}
    assert got_drops == drops_ref


def test_replay_is_idempotent(spark, tmp_path):
    rows = corpus_rows()
    m = SetSimMaintainer(str(tmp_path))
    m.process_batch(spark.createDataFrame(rows[:5], SCHEMA), 0)
    m.process_batch(spark.createDataFrame(rows[5:], SCHEMA), 1)
    all_df = spark.createDataFrame(rows, SCHEMA)
    before = (survivor_ids(m, all_df), sorted(map(tuple, m.drops(spark).collect())))
    m.process_batch(spark.createDataFrame(rows[5:], SCHEMA), 1)  # replay
    after = (survivor_ids(m, all_df), sorted(map(tuple, m.drops(spark).collect())))
    assert after == before


def test_horizon_bounds_match_window(spark, tmp_path):
    m = SetSimMaintainer(str(tmp_path), horizon_batches=1)
    m.process_batch(spark.createDataFrame([(1, BASE)], SCHEMA), 0)
    m.process_batch(
        spark.createDataFrame([(2, "some unrelated filler text here ok")], SCHEMA), 1
    )
    # batch 0 is outside the 1-batch horizon: the exact copy is KEPT
    m.process_batch(spark.createDataFrame([(3, BASE)], SCHEMA), 2)
    all_df = spark.createDataFrame([(1, BASE), (2, "x y z w v u"), (3, BASE)], SCHEMA)
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
    m = SetSimMaintainer(str(tmp_path / "state"))
    q = m.run_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    surv = survivor_ids(m, df)
    # survivors pairwise dissimilar — the EXACT pair join finds nothing
    surv_df = df.join(
        spark.createDataFrame([(i,) for i in surv], "doc_id long"), "doc_id"
    )
    assert allpairs_jaccard_join(shingle_sets(surv_df)).count() == 0
    assert {r["keeper"] for r in m.drops(spark).collect()} <= surv
