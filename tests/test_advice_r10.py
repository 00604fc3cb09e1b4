"""ADVICE r10 regression tests (sinks/parquet_sink.py):

1. vacuum/publish race — the version-existence check + claim link now
   run under the store maintenance lock (the same flock vacuum holds
   across pin-read + delete), so a committed manifest can never pin a
   vacuumed version; a genuinely stale publish still fails loudly.
2. a crashed publisher's uncommitted frontier claim is ADOPTED by
   ``prune_generations`` once age-gated, so its pinned versions no
   longer wait forever for a future publish; a FRESH claim (live
   publisher mid-flight) is left alone.
3. prune drops marker-before-manifest and sweeps the residue of a
   crashed prune (lone manifest or lone marker below the current
   generation), so no permanent junk accumulates in _generations.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.sinks.parquet_sink import (
    ConcurrentWriteError,
    ParquetSnapshotSink,
)


def _store(spark, tmp_path, n_gens=1):
    sink = ParquetSnapshotSink(str(tmp_path / "store"))
    for i in range(n_gens):
        df = spark.createDataFrame(
            [(k, i, False) for k in range(3)], "pk bigint, seq bigint, is_delete boolean"
        ).withColumn("seq", F.col("seq") + 1 + i)
        sink.merge(df, "A", key_cols=["pk"], seq_col="seq")
        sink.publish_generation()
    return sink


def _gen_file(sink, name, content=None):
    d = os.path.join(sink.root, "_generations")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as fh:
        fh.write(content or "")
    return p


def test_stale_publish_fails_after_out_of_band_vacuum(spark, tmp_path):
    """A publisher whose derived version map references a version that
    vacuum already removed must fail loudly at the locked existence
    check, never commit a dangling manifest."""
    sink = _store(spark, tmp_path, n_gens=3)
    sink.prune_generations(keep_generations=1)
    sink.vacuum("A", keep_last=1)
    gone = sink.versions("A")[0] - 1  # v=0 was vacuumed
    assert gone not in sink.versions("A")
    with pytest.raises(ConcurrentWriteError, match="no longer on disk"):
        sink.publish_generation(versions={"A": gone})
    # the failed attempt left no claim behind
    cur = sink.current_generation()
    assert not os.path.exists(
        os.path.join(sink.root, "_generations", f"gen={cur + 1}.json")
    )


def test_prune_adopts_age_gated_stale_claim(spark, tmp_path):
    """ADVICE r10 #2: an hour-old uncommitted frontier claim (dead
    publisher) is adopted by the maintenance turn — its manifest is
    committed verbatim and retention/vacuum can move past it."""
    sink = _store(spark, tmp_path)  # gen 0 committed
    p = _gen_file(
        sink, "gen=1.json", json.dumps({"A": 0, "_publisher": "deadbeef"})
    )
    old = time.time() - 7200
    os.utime(p, (old, old))
    assert sink.current_generation() == 0
    sink.prune_generations(keep_generations=8)
    assert sink.current_generation() == 1  # adopted
    assert sink.manifest(1) == {"A": 0}  # the dead writer's content, verbatim


def test_prune_leaves_fresh_frontier_claim_alone(spark, tmp_path):
    """A fresh uncommitted claim is a LIVE publisher mid-flight — the
    age gate must not commit under it."""
    sink = _store(spark, tmp_path)
    _gen_file(sink, "gen=1.json", json.dumps({"A": 0, "_publisher": "live"}))
    sink.prune_generations(keep_generations=8)
    assert sink.current_generation() == 0  # not adopted
    # and its versions stay pinned in vacuum exactly as before
    assert 0 in sink._generation_pinned("A")


def test_prune_sweeps_crash_residue(spark, tmp_path):
    """ADVICE r10 #3: below the current generation, a lone marker
    (manifest already removed — the old removal order's crash state) and
    a lone manifest (marker removed first — the new order's crash state)
    are both provably prune debris and get swept."""
    sink = _store(spark, tmp_path, n_gens=3)  # gens 0,1,2 committed
    d = os.path.join(sink.root, "_generations")
    # old-order crash residue: marker without manifest (gen 0)
    os.remove(os.path.join(d, "gen=0.json"))
    # new-order crash residue: manifest without marker (gen 1)
    os.remove(os.path.join(d, "gen=1.COMMIT"))
    sink.prune_generations(keep_generations=8)
    names = set(os.listdir(d))
    assert "gen=0.COMMIT" not in names
    assert "gen=1.json" not in names
    # the current generation is untouched and fully readable
    assert sink.current_generation() == 2
    assert sink.manifest(2)["A"] == 2


def test_prune_drop_order_is_marker_first(spark, tmp_path, monkeypatch):
    """Crash-inject into the drop loop: if manifest removal dies, the
    leftover state must be claim-without-marker (handled), never an
    orphan marker."""
    sink = _store(spark, tmp_path, n_gens=3)
    d = os.path.join(sink.root, "_generations")
    real_remove = os.remove
    dropped_manifests = []

    def exploding_remove(path):
        if path.endswith(".json") and "/gen=" in path.replace("\\", "/"):
            dropped_manifests.append(path)
            raise OSError("simulated crash mid-prune")
        return real_remove(path)

    monkeypatch.setattr(os, "remove", exploding_remove)
    with pytest.raises(OSError, match="simulated crash"):
        sink.prune_generations(keep_generations=1)
    monkeypatch.undo()
    # the interrupted generation lost its marker first: claim remains
    g = int(os.path.basename(dropped_manifests[0])[4:-5])
    names = set(os.listdir(d))
    assert f"gen={g}.json" in names  # claim survives the crash
    assert f"gen={g}.COMMIT" not in names  # marker went first
    # the NEXT maintenance turn sweeps the lone manifest
    sink.prune_generations(keep_generations=1)
    assert f"gen={g}.json" not in set(os.listdir(d))


def test_vacuum_respects_claim_linked_before_lock(spark, tmp_path):
    """Functional pin check through the locked path: a claim present
    when vacuum snapshots its pin set keeps its versions through the
    locked delete."""
    sink = _store(spark, tmp_path, n_gens=3)
    # uncommitted frontier claim pinning the OLDEST version
    _gen_file(sink, "gen=3.json", json.dumps({"A": 0, "_publisher": "x"}))
    sink.prune_generations(keep_generations=1)  # fresh claim: not adopted
    removed = sink.vacuum("A", keep_last=1)
    assert 0 not in removed  # pinned by the in-flight claim
    assert 0 in sink.versions("A")
    shutil.rmtree(os.path.join(sink.root, "_generations"))
