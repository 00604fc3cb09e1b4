#!/usr/bin/env python
"""Round-9 sf1 scaling probe, tier 2 (VERDICT r08 #5): extend the
round-8 probe to the next cost class — q230 (components + argmax),
q183/q191 (exact-IVF family), q171 substring dedup, q116 dedup
pipeline, and the PqIndexMaintainer at large vector batches.

Weak-scaling fixture (the round-8 recipe):
- documents x10: key-shifted copies of sf0.1 with per-copy DISJOINT
  vocabulary (every word gets a copy suffix), so per-copy dedup /
  shingle structure is preserved and copies don't near-collide;
- embeddings: 20k fresh fixture-style unit vectors, 10 weak clusters,
  dim 64 (same generator shape as round 8).

Method: min-of-2 warm runs at sf0.1 and at the 10x fixture, 360 s cap
per run (one timing run; if run 1 exceeds the cap the lane is recorded
TIMEOUT). exponent = log10(t10/t1). Results go to docs/PLANS.md.

Usage: python tools/probe_round9.py [lane ...]
(default: the LANES list below; the PqIndexMaintainer probe is heavy —
run it explicitly with `python tools/probe_round9.py pq_maintainer`)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
PROBE_ROOT = "/tmp/probe_r9"
SF1 = os.path.join(PROBE_ROOT, "sf1")
CAP_S = 360.0

LANES = [
    "q230_cluster_representative",
    "q183_hard_negatives",
    "q191_knn_label_eval",
    "q171_substring_dedup",
    "q116_dedup_pipeline",
]


def build_fixture() -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)
    docs_out = os.path.join(SF1, "documents.parquet")
    if not os.path.exists(docs_out):
        con = duckdb.connect()
        con.execute(
            f"""COPY (
              SELECT d.doc_id + i.r * 10000000 AS doc_id,
                     regexp_replace(d.text, '([a-z]+)',
                                    '\\1q' || CAST(i.r AS VARCHAR), 'g') AS text,
                     d.lang, d.source, d.n_chars
              FROM read_parquet('{SF01}/documents.parquet') d,
                   (SELECT unnest(generate_series(0, 9)) AS r) i
            ) TO '{docs_out}' (FORMAT PARQUET)"""
        )
        con.close()
    emb_out = os.path.join(SF1, "embeddings.parquet")
    if not os.path.exists(emb_out):
        rng = np.random.RandomState(9)
        n, dim, k = 20000, 64, 10
        centers = rng.randn(k, dim)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.randint(0, k, n)
        x = centers[labels] + 0.6 * rng.randn(n, dim)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [row.astype("float32") for row in x], pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype("int32"), pa.int32()),
            }
        )
        pq.write_table(tbl, emb_out)


def time_lane(fn, spark, sf_dir) -> float | None:
    """min-of-2 warm; TIMEOUT only when the FIRST run exceeds the cap
    (a second-run GC spike must not discard a valid sub-cap minimum)."""
    best = None
    for rep in range(2):
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if rep == 0 and dt > CAP_S:
            return None
    return best


def probe_pq_maintainer(spark) -> list[tuple[str, float]]:
    """process_batch wall clock at 100k and 1M fresh vectors against a
    base index — the encode path is the per-batch cost; the drift
    retrain (if tripped) is bounded by retrain_sample."""
    import numpy as np
    import pandas as pd

    from snowflake_cdc_spark.operators.pq import build_pq
    from snowflake_cdc_spark.streaming.pq_maintenance import PqIndexMaintainer

    def vectors_df(n, seed, start_id):
        rng = np.random.RandomState(seed)
        x = rng.randn(n, 64).astype("float64")
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        pdf = pd.DataFrame(
            {"vec_id": np.arange(start_id, start_id + n), "embedding": list(x)}
        )
        return spark.createDataFrame(pdf).repartition(32)

    base = vectors_df(20000, 1, 0).cache()
    base.count()
    out = []
    idx = build_pq(base, m=8, k=64)
    maint = PqIndexMaintainer(idx)
    for n, seed in ((100_000, 2), (1_000_000, 3)):
        batch = vectors_df(n, seed, 10_000_000 * seed).cache()
        batch.count()
        t0 = time.time()
        maint.process_batch(batch, batch_id=seed)
        out.append((f"pq_maintainer_batch_{n}", time.time() - t0))
        batch.unpersist()
    base.unpersist()
    return out


def main(argv: list[str]) -> int:
    from snowflake_cdc_spark import queries as q
    from snowflake_cdc_spark.session import get_spark

    build_fixture()
    # lanes only touch documents/embeddings; link the rest for _t reads
    for t in "region nation customer supplier part orders lineitem events".split():
        dst = os.path.join(SF1, f"{t}.parquet")
        if not os.path.exists(dst):
            src = os.path.join(SF01, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, dst)

    spark = get_spark(app_name="probe_round9")
    qs = q.queries()
    names = argv or LANES
    print(f"{'lane':35s} {'sf0.1':>8s} {'10x':>8s} {'exp':>6s}")
    for name in names:
        if name == "pq_maintainer":
            for label, dt in probe_pq_maintainer(spark):
                print(f"{label:35s} {'':>8s} {dt:8.1f}")
            continue
        fn = qs[name]
        t1 = time_lane(fn, spark, SF01)
        t10 = time_lane(fn, spark, SF1) if t1 is not None else None
        if t1 is None:
            print(f"{name:35s} TIMEOUT")
        elif t10 is None:
            print(f"{name:35s} {t1:8.2f} TIMEOUT>360   >1.5")
        else:
            exp = math.log10(t10 / t1) if t1 > 0 else float("nan")
            print(f"{name:35s} {t1:8.2f} {t10:8.2f} {exp:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
