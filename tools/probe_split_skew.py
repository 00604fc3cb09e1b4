#!/usr/bin/env python
"""Round-11 split-skew probe (VERDICT r10 #2 done-criterion): the
stratified split on a TWO-source corpus at 10x rows — the 100-TB regime
where `row_number() OVER (PARTITION BY source ...)` puts half the
corpus in ONE window partition. Compares:

- window: the pre-round-11 per-source total-sort rank;
- bucketed: operators/splits.py::stratified_split (grouped_hash_rank —
  per-(source, hex-prefix-bucket) sort, 512 sorted regions instead
  of 2).

Fixture: the round-10 10x documents (500k rows) with source collapsed
to doc_id % 2 — two sources, ~250k rows each. Both forms aggregate to
the q210 report (forcing full rank materialization); outputs are
asserted EQUAL before timing. Method: min-of-2 warm.

Usage: python tools/probe_split_skew.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.probe_round10 import build_fixture


def _base(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string")).alias(
            "source"
        ),
        F.length("text").cast("bigint").alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )


def _report(s):
    return (
        s.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


def window_form(spark, sf_dir):
    d = _base(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    wn = Window.partitionBy("source")
    r = d.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    split = (
        F.when(F.col("rk") <= F.expr("(8 * n) DIV 10"), "train")
        .when(F.col("rk") <= F.expr("(9 * n) DIV 10"), "val")
        .otherwise("test")
    )
    return _report(r.withColumn("split", split))


def bucketed_form(spark, sf_dir):
    from snowflake_cdc_spark.operators.splits import stratified_split

    return _report(stratified_split(_base(spark, sf_dir)))


def main() -> int:
    from snowflake_cdc_spark.session import get_spark

    spark = get_spark(app_name="probe_split_skew")
    d10 = build_fixture(10)
    a = sorted(map(tuple, window_form(spark, d10).collect()))
    b = sorted(map(tuple, bucketed_form(spark, d10).collect()))
    assert a == b, "forms diverge — rank is not window-identical"
    print("outputs identical at 10x; timing (min-of-2 warm):")
    for mult in (10, 100):
        sf_dir = build_fixture(mult)
        for name, fn in (("window", window_form), ("bucketed", bucketed_form)):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"x{mult:<4d} {name:9s} {best:7.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
