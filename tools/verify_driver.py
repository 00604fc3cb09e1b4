"""Simulate the grading driver: vanilla SparkSession, run every
queries() entry at sf0.01 and compare to oracle_sql() in DuckDB
(row-count + order-insensitive value-hash, columns sorted by name)."""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import sys

import os

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        # str(), NOT normalize(): the driver renders engine decimals as-is,
        # so scale mismatches (253942.00 vs 253942.0) must FAIL here too —
        # final projections should never be DECIMAL-typed (cast to double).
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    print(f"entry(): {n} rows")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = sys.argv[1:]
    fails = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            fails.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: {len(srows)} rows (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            fails.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            fails.append((name, f"schema {scols} vs {dcols}"))
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            continue
        sset, dset = rowset(scols, srows), rowset(dcols, drows)
        if len(sset) != len(dset):
            fails.append((name, f"rowcount {len(sset)} vs {len(dset)}"))
            print(f"FAIL {name}: rowcount {len(sset)} vs {len(dset)}")
        elif sset != dset:
            diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
            fails.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ e.g. {diff}")
        else:
            print(f"ok   {name}: {len(sset)} rows match")
    print(f"\n{len(queries)} queries, {len(fails)} failures")
    if fails:
        for name, why in fails:
            print(f"  {name}: {why}")
        sys.exit(1)


if __name__ == "__main__":
    main()
