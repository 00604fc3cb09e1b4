#!/usr/bin/env python
"""Regenerate docs/PLANS.md: physical-plan evidence for the scale-posture
claims (pushdown, pruning, broadcast, partial aggregation, bucketing) plus
a large-synthetic latest-by-key scaling probe. Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

SF = "/root/testdata/sf0.1"
OUT = os.path.join(_REPO_ROOT, "docs", "PLANS.md")


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def grep(plan: str, *patterns: str, max_lines: int = 12) -> str:
    keep = []
    for line in plan.splitlines():
        s = line.strip()
        if any(re.search(p, s) for p in patterns):
            keep.append(s[:140])
    return "\n".join(keep[:max_lines])


def main() -> None:
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.operators.bucketing import (
        bucketed_join,
        shuffle_exchanges_in_plan,
        write_bucketed,
    )
    from snowflake_cdc_spark.operators.upsert import latest_by_key
    from snowflake_cdc_spark.queries import queries
    from snowflake_cdc_spark.session import get_spark
    from snowflake_cdc_spark.sources.io import read_table

    spark = get_spark(app_name="dump_plans")
    qs = queries()
    sections: list[str] = []

    p = plan_text(qs["q01_filter_eq"](spark, SF))
    sections.append(
        "## q01 — filter pushdown + column pruning\n\n```\n"
        + grep(p, "PushedFilters", "ReadSchema")
        + "\n```\nThe equality predicate reaches the parquet scan; only the 2 "
        "projected columns are read.\n"
    )

    p = plan_text(qs["q12_multi_join"](spark, SF))
    sections.append(
        "## q12 — join strategy + pruned scans\n\n```\n"
        + grep(p, r"Join", "PushedFilters", "ReadSchema")
        + "\n```\nBoth dimension joins go broadcast at this SF (AQE would demote "
        "to sort-merge when the build side outgrows the threshold); every scan "
        "reads only its join/aggregate columns.\n"
    )

    p = plan_text(qs["q07_upsert_hard_delete"](spark, SF))
    sections.append(
        "## q07 — latest-by-key as a two-phase aggregation\n\n```\n"
        + grep(p, "partial_max_by", max_lines=3)
        + "\n```\n`partial_max_by` below the Exchange: each map task ships at most "
        "one candidate row per key per partition — the property that makes the "
        "CDC merge skew-resistant (a hot key's million changes collapse before "
        "the shuffle).\n"
    )

    # bucketed co-located join
    orders = read_table(spark, SF, "orders")
    li = read_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "plans_b_orders", "o_orderkey", buckets=16)
    write_bucketed(li, "plans_b_li", "o_orderkey", buckets=16)
    j = bucketed_join(spark, "plans_b_orders", "plans_b_li", "o_orderkey")
    n_ex = shuffle_exchanges_in_plan(j)
    sections.append(
        f"## bucketed join — co-location\n\nShuffle Exchanges in the bucketed "
        f"orders⋈lineitem plan: **{n_ex}** (the same join over raw parquet "
        "plans 2). Bucketing pays the shuffle once at write time.\n"
    )
    spark.sql("DROP TABLE IF EXISTS plans_b_orders")
    spark.sql("DROP TABLE IF EXISTS plans_b_li")

    # scaling probe: 50M synthetic changes, heavy skew
    n = 50_000_000
    changes = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.col("id") % 97)  # 30% on 97 hot keys
        .otherwise(F.col("id") % 5_000_000)
        .alias("key"),
        F.col("id").alias("seq"),
        (F.col("id") % 1009).alias("value"),
    )
    t0 = time.perf_counter()
    cnt = latest_by_key(changes, ["key"]).count()
    dt = time.perf_counter() - t0
    sections.append(
        f"## scaling probe — latest_by_key over {n:,} synthetic changes\n\n"
        f"30% of changes hit 97 hot keys, the rest spread over 5M keys.\n"
        f"Distinct keys out: {cnt:,}; wall-clock on local[32]: **{dt:.1f} s** "
        f"(~{n/dt/1e6:.0f}M changes/s). The max_by partial aggregation keeps "
        "the hot keys from serializing into single tasks; throughput is "
        "scan-bound, which is what should survive a 1000-executor scale-out.\n"
    )

    header = (
        "# PLANS — physical-plan evidence (regenerate: `python tools/dump_plans.py`)\n\n"
        f"Generated against `{SF}` on local[32].\n\n"
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write(header + "\n".join(sections))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
