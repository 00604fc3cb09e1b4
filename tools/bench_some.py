#!/usr/bin/env python
"""Targeted bench: time a named subset of the declared queries with the
exact bench.py methodology (warm session, noop sink, min-of-2) so a
single optimization can be measured without paying the full 267-query
sweep. Usage:

    python tools/bench_some.py q241_byte_bpe_train q242_byte_bpe_coverage

Prints one ``name: sec`` line per query and a total. Same session
config as bench.py (session.get_spark, local[$SPARK_GRAFT_CPUS]).
The warmup / timing / between-query-cleanup discipline is IMPORTED
from bench.py (ADVICE r11) so the two tools cannot silently diverge.
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from bench import (  # noqa: E402  (bench.py owns the methodology)
    CPUS,
    RUNS,
    SF_DIR,
    clear_between_queries,
    warm_session,
)


def main() -> None:
    from snowflake_cdc_spark.queries import queries
    from snowflake_cdc_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark(app_name="bench_some", cpus=int(CPUS))
    warm_session(spark)

    reg = queries()
    total = 0.0
    for name in names:
        fn = reg[name]
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        clear_between_queries(spark)
        t = min(times)
        total += t
        print(f"{name}: {t:.3f}  (runs: {', '.join(f'{x:.3f}' for x in times)})",
              flush=True)
    print(f"TOTAL: {total:.3f}")


if __name__ == "__main__":
    main()
