#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named declared queries into
``plans/r12/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence. Usage:

    python tools/dump_query_plans.py before q241_byte_bpe_train ...
    python tools/dump_query_plans.py after  q241_byte_bpe_train ...

Uses sf0.1 and the bench session so plans match what the bench runs.
Note: queries with driver-side control loops (BPE training, graph
fixpoints) EXECUTE those loops while the final DataFrame is built; the
dumped plan is the final composed plan, which is what the claims cite.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
OUT_DIR = os.path.join(_REPO_ROOT, "plans", "r12")


def main() -> None:
    from snowflake_cdc_spark.queries import queries
    from snowflake_cdc_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans", cpus=int(CPUS))
    reg = queries()
    for name in names:
        df = reg[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()
        try:
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        except Exception:
            pass


if __name__ == "__main__":
    main()
