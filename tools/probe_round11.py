#!/usr/bin/env python
"""Round-11 probe (VERDICT r10 #1/#4): q244's two assignment postures
timed at sf0.1 / 10x / 100x on the round-10 weak-scaling fixtures,
AFTER the pair-stage codegen fix (the Generate barrier in
operators/semdedup.py that stops predicate pushdown from inlining three
copies of the 64-term dot product into the join condition — round 10's
'Code grows beyond 64 KB' interpreted fallback).

- **exact**: the registry q244 — relational_kmeans_fit assignment
  (oracle-checkable; N x k interpreted-HOF distance join, the measured
  100x dominator in round 10);
- **production**: semantic_dup_pairs_production — operators/ivf.py
  bounded-sample numpy training + pandas_udf matmul assignment (driver
  state O(sample)); pair stage byte-identical. Parity with the exact
  path is pinned by tests/test_semdedup_production.py.

Method mirrors tools/probe_round10.py: min-of-2 warm, 600 s cap.
Results go to docs/PLANS.md round-11.

Usage: python tools/probe_round11.py [exact|production ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_round10 import CAP_S, SF01, build_fixture  # noqa: E402


def _exact(spark, sf_dir):
    from snowflake_cdc_spark import queries as q

    return q.queries()["q244_semdedup_scaled"](spark, sf_dir)


def _production(spark, sf_dir):
    from snowflake_cdc_spark.operators.semdedup import (
        semantic_dup_pairs_production,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dup_pairs_production(
        emb, t_num=9, t_den=20, dim=64, cell_cap=4096
    )


LANES = {"exact": _exact, "production": _production}


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
    from snowflake_cdc_spark.session import get_spark

    d10 = build_fixture(10)
    d100 = build_fixture(100)
    spark = get_spark(app_name="probe_round11")
    names = argv or list(LANES)
    print(
        f"{'lane':12s} {'sf0.1':>8s} {'10x':>8s} {'100x':>8s} "
        f"{'exp1':>6s} {'exp2':>6s}"
    )
    for name in names:
        fn = LANES[name]
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
        print(f"{name:12s} {_f(t1)} {_f(t10)} {_f(t100)} {e1} {e2}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
