#!/usr/bin/env python
"""Whole-registry layout-determinism audit: run every declared query at
two parallelism levels (different partition counts, different executor
thread counts) and compare canonicalized result hashes. The DuckDB
oracle check proves cross-ENGINE agreement; this proves the Spark side
is invariant to its own physical layout — the property every md5-keyed
sample, fixed-order sum, and struct-ordered tie-break exists to ensure.

    python tools/determinism_audit.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def canon(v):
    import datetime
    import decimal

    if v is None:
        return "\0"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def run_all(master: str, partitions: int) -> dict[str, tuple]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = {}
    for name, fn in sorted(mod.queries().items()):
        rows = fn(spark, SF).collect()
        cols = rows[0].__fields__ if rows else []
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out[name] = (
            tuple(sorted(cols)),
            tuple(sorted(tuple(canon(r[i]) for i in order) for r in rows)),
        )
    spark.stop()
    return out


def main() -> None:
    a = run_all("local[8]", 7)
    b = run_all("local[32]", 32)
    bad = [n for n in a if a[n] != b[n]]
    for n in bad:
        print(f"MISMATCH {n}")
    print(f"{len(a)} queries, {len(bad)} layout-dependent")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
