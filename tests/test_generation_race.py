"""True multi-process race test for the commit-marker generation
protocol (ADVICE r09 medium): N OS processes hammer publish_generation
on one store concurrently. Under the old claim-then-CAS-pointer-flip
protocol this interleaving could delete a committed manifest (dangling
pointer) or commit a racer's content under another publisher's flip;
with immutable claims + exclusive COMMIT markers both are impossible —
asserted directly on the surviving files. No Spark needed: the
protocol is pure filesystem."""

from __future__ import annotations

import json
import multiprocessing as mp
import os

from snowflake_cdc_spark.sinks.parquet_sink import (
    ConcurrentWriteError,
    ParquetSnapshotSink,
)


def _publisher(root: str, pid: int, n_pub: int, out: mp.Queue) -> None:
    sink = ParquetSnapshotSink(root)
    results = []
    for i in range(n_pub):
        v = pid * 1000 + i
        # stage the version dir the manifest will pin — publish's
        # stale-version fast-fail (round 10) rejects pins of versions
        # that are not on disk
        os.makedirs(os.path.join(root, "T", f"v={v}"), exist_ok=True)
        try:
            g = sink.publish_generation({"T": v})
            results.append(("ok", g, v))
        except ConcurrentWriteError:
            results.append(("lost", None, v))
    out.put((pid, results))


def test_concurrent_publishers_never_tear_or_dangle(tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    n_procs, n_pub = 6, 12
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_publisher, args=(root, pid, n_pub, q))
        for pid in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=60)

    sink = ParquetSnapshotSink(root)
    cur = sink.current_generation()
    assert cur >= 0
    gen_dir = os.path.join(root, "_generations")
    claims = {
        int(n[4:-5])
        for n in os.listdir(gen_dir)
        if n.startswith("gen=") and n.endswith(".json")
    }
    markers = {
        int(n[4:-7])
        for n in os.listdir(gen_dir)
        if n.startswith("gen=") and n.endswith(".COMMIT")
    }
    # 1. the committed sequence is gap-free from 0 to the frontier and
    #    every committed generation's manifest file survived (no
    #    dangling reads, ever)
    assert markers == set(range(cur + 1))
    assert markers <= claims
    # 2. every committed manifest is complete, parseable, and is EXACTLY
    #    one publisher's staged content (never torn, never mixed)
    staged = set()
    for _pid, rs in results:
        for status, _g, v in rs:
            staged.add(v)
    for g in sorted(markers):
        with open(os.path.join(gen_dir, f"gen={g}.json")) as fh:
            m = json.load(fh)
        assert set(m) == {"T", "_publisher"}
        assert m["T"] in staged
    # 3. a publisher that returned success really owns its generation:
    #    the committed manifest at g carries ITS versions
    for _pid, rs in results:
        for status, g, v in rs:
            if status == "ok":
                with open(os.path.join(gen_dir, f"gen={g}.json")) as fh:
                    assert json.load(fh)["T"] == v
    # 4. liveness: successes happened despite the storm (adoption
    #    guarantees progress; with 72 racing publishes the frontier
    #    must have moved well past zero)
    n_ok = sum(
        1 for _pid, rs in results for status, _g, _v in rs if status == "ok"
    )
    assert n_ok >= 1 and cur + 1 >= n_ok  # one generation per success
    # distinct winners: no two successes share a generation number
    wins = [g for _pid, rs in results for status, g, _v in rs if status == "ok"]
    assert len(wins) == len(set(wins))
