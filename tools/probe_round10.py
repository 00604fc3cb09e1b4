#!/usr/bin/env python
"""Round-10 weak-scaling probe, two decades (VERDICT r09 #5): the
round-8/9 probes cover one decade (10x); this one extends the three
cheapest-to-generate LINEAR claims to ~100x so the exponent is
confirmed across two decades:

- q52c_ivf_ann_panel   (fixed-128-panel ANN recall eval — claimed linear)
- q200_semdedup        (SemDeDup — measured 1.02 at 10x in round 8)
- q221_dsir_selection  (DSIR scoring + sort-free selection — linear)

Fixtures (the established weak-scaling recipes):
- documents x10 / x100: key-shifted copies of sf0.1 with per-copy
  DISJOINT vocabulary (suffix per copy), so shingle/dedup structure is
  preserved and copies don't near-collide;
- embeddings x10 / x100: fresh fixture-style unit vectors (10 weak
  clusters, dim 64; 20k and 200k rows — sf0.1 has 2k).

Method: min-of-2 warm per scale, 600 s cap; exponents reported per
decade: exp1 = log10(t10/t1), exp2 = log10(t100/t10). A linear lane
holds ~<= 1.0 in BOTH decades (small-SF fixed overhead deflates exp1;
exp2 is the honest decade). Results go to docs/PLANS.md round-10.

Usage: python tools/probe_round10.py [lane ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
PROBE_ROOT = "/tmp/probe_r10"
CAP_S = 600.0

LANES = ["q52c_ivf_ann_panel", "q200_semdedup", "q221_dsir_selection"]


def build_fixture(mult: int) -> str:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(PROBE_ROOT, f"x{mult}")
    os.makedirs(out_dir, exist_ok=True)
    docs_out = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(docs_out):
        con = duckdb.connect()
        con.execute(
            f"""COPY (
              SELECT d.doc_id + i.r * 10000000 AS doc_id,
                     regexp_replace(d.text, '([a-z]+)',
                                    '\\1q' || CAST(i.r AS VARCHAR), 'g') AS text,
                     d.lang, d.source, d.n_chars
              FROM read_parquet('{SF01}/documents.parquet') d,
                   (SELECT unnest(generate_series(0, {mult - 1})) AS r) i
            ) TO '{docs_out}' (FORMAT PARQUET)"""
        )
        con.close()
    emb_out = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(emb_out):
        rng = np.random.RandomState(10 + mult)
        n, dim, k = 2000 * mult, 64, 10
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
    for t in "region nation customer supplier part orders lineitem events".split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            src = os.path.join(SF01, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, dst)
    return out_dir


def time_lane(fn, spark, sf_dir) -> float | None:
    best = None
    for rep in range(2):
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if rep == 0 and dt > CAP_S:
            return None
    return best


def main(argv: list[str]) -> int:
    from snowflake_cdc_spark import queries as q
    from snowflake_cdc_spark.session import get_spark

    d10 = build_fixture(10)
    d100 = build_fixture(100)
    spark = get_spark(app_name="probe_round10")
    qs = q.queries()
    names = argv or LANES
    print(
        f"{'lane':28s} {'sf0.1':>8s} {'10x':>8s} {'100x':>8s} "
        f"{'exp1':>6s} {'exp2':>6s}"
    )
    for name in names:
        fn = qs[name]
        t1 = time_lane(fn, spark, SF01)
        t10 = time_lane(fn, spark, d10) if t1 is not None else None
        t100 = time_lane(fn, spark, d100) if t10 is not None else None

        def _f(v):
            return f"{v:8.2f}" if v is not None else " TIMEOUT"

        e1 = (
            f"{math.log10(t10 / t1):6.2f}"
            if t1 and t10
            else "  >1.5" if t1 else "     ?"
        )
        e2 = (
            f"{math.log10(t100 / t10):6.2f}"
            if t10 and t100
            else "  >1.5" if t10 else "     ?"
        )
        print(f"{name:28s} {_f(t1)} {_f(t10)} {_f(t100)} {e1} {e2}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
