#!/usr/bin/env python
"""Round-12 parallel-scaling probe (VERDICT r11 item 5): at sf0.1 the
bench cannot demonstrate parallelism — most lanes are fixed-overhead
bound and 28/71 driver-visible queries ran FASTER on 8 cores. This
probe runs the heaviest lanes on the round-10 10x weak-scaling fixture
(documents/embeddings scaled 10x, enough rows that task work exists)
at two core counts and reports the speedup; shuffle/compute-bound
lanes should approach the core ratio, driver-bound lanes stay ~1.

Each core count runs in its OWN subprocess (a SparkSession's master is
fixed at creation), min-of-2 warm per lane, noop sink — the bench
methodology. Usage:

    python tools/probe_r12_scaling.py            # both core counts
    python tools/probe_r12_scaling.py --run 8    # internal: one count
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

LANES = [
    "q200_semdedup",
    "q116_dedup_pipeline",
    "q133_pq_ann",
    "q144_ivfpq_ann",
    "q137_triangles",
]
CPU_COUNTS = (8, 32)


def run_one(cpus: int) -> dict[str, float]:
    from tools.probe_round10 import build_fixture
    from snowflake_cdc_spark.queries import queries
    from snowflake_cdc_spark.session import get_spark

    sf_dir = build_fixture(10)
    spark = get_spark(app_name=f"probe_r12_scaling_{cpus}", cpus=cpus)
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    reg = queries()
    out: dict[str, float] = {}
    for name in LANES:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        try:
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        except Exception:
            pass
        out[name] = round(min(times), 3)
    return out


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        cpus = int(sys.argv[2])
        print("RESULT " + json.dumps(run_one(cpus)))
        return 0
    results: dict[int, dict[str, float]] = {}
    for cpus in CPU_COUNTS:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus)],
            capture_output=True, text=True, env=env, cwd=_REPO_ROOT,
        )
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                results[cpus] = json.loads(line[len("RESULT "):])
        if cpus not in results:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"no RESULT line for cpus={cpus}")
    lo, hi = CPU_COUNTS
    print(f"{'lane':30s} {f'c{lo}':>8s} {f'c{hi}':>8s} {'speedup':>8s}")
    for name in LANES:
        a, b = results[lo][name], results[hi][name]
        print(f"{name:30s} {a:8.2f} {b:8.2f} {a / b:8.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
