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

    # as-of join: one shuffle, no pairwise blow-up
    from snowflake_cdc_spark.operators.asof import asof_join

    events = read_table(spark, SF, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    aj = asof_join(
        events, purchases, "user_id", "ts", "ts",
        {"event_id": "last_purchase_id"}, tie_col="event_id",
    )
    p = plan_text(aj)
    n_ex = len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE))
    sections.append(
        f"## as-of join — single-shuffle union-merge\n\n```\n"
        + grep(p, r"^\(\d+\) Exchange", r"Window", max_lines=6)
        + f"\n```\nHash Exchanges in the plan: **{n_ex}** (both sides co-partition "
        "on the key in ONE exchange of the union; a range-join formulation "
        "would materialize |left|×|matches-per-key| rows before pruning). "
        "The window sort is the only per-key work — same cost class as a "
        "windowed dedup.\n"
    )

    p = plan_text(qs["q59_band_join"](spark, SF))
    sections.append(
        "## q59 — band (range) join strategy\n\n```\n"
        + grep(p, "BroadcastNestedLoopJoin", "ReadSchema", max_lines=6)
        + "\n```\nThe 3-row tier table broadcasts; the fact side streams through "
        "the nested-loop probe without shuffling — constant-size build side, "
        "scan-bound at any SF.\n"
    )

    p = plan_text(qs["q53_exists_semi"](spark, SF))
    sections.append(
        "## q53 — EXISTS as semi join\n\n```\n"
        + grep(p, "Join", "PushedFilters", max_lines=8)
        + "\n```\nThe correlated EXISTS decorelates to a semi join; the "
        "l_quantity predicate is pushed to the lineitem scan so the join "
        "build only sees qualifying rows.\n"
    )

    p = plan_text(qs["q81_q21_shape"](spark, SF))
    joins = grep(p, r"Join", max_lines=6)
    sections.append(
        "## q81 — EXISTS/NOT-EXISTS self joins stay hash-based\n\n```\n"
        + joins
        + "\n```\nBoth correlated self joins keep the l_orderkey equi key, so "
        "Spark plans hash joins (broadcast at this SF, shuffled-hash/SMJ "
        "beyond the threshold) — never a nested loop over the fact table.\n"
    )

    p = plan_text(qs["q79_q8_shape"](spark, SF))
    n_bc = len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.MULTILINE))
    sections.append(
        f"## q79 — 8-relation market-share join\n\n"
        f"BroadcastHashJoins in the plan: **{n_bc}** — every dimension chain "
        "(part, supplier, customer→nation→region, supplier→nation) broadcasts; "
        "lineitem is never shuffled until the single partial-agg exchange on "
        "o_year.\n"
    )

    p = plan_text(qs["q88_bigrams"](spark, SF))
    sections.append(
        "## q88 — explode-heavy text aggregation\n\n```\n"
        + grep(p, "Generate", "partial_count", "Exchange", max_lines=6)
        + "\n```\nThe split array materializes once behind a projection "
        "barrier; the exploded bigrams partial-aggregate before the single "
        "shuffle (map-side combine on the generated rows).\n"
    )

    p = plan_text(qs["q108_contamination"](spark, SF))
    n_bc = len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.MULTILINE))
    sections.append(
        "## q108 — decontamination shingle join\n\n```\n"
        + grep(p, "Join", "partial_count", max_lines=6)
        + f"\n```\nBroadcastHashJoins: **{n_bc}** — the deduplicated benchmark "
        "shingle set is the build side (AQE demotes to a shuffled hash join "
        "when the benchmark slice outgrows the threshold); overlap counting "
        "partial-aggregates per (doc, shingle) before the only data-sized "
        "shuffle, so boilerplate hot shingles collapse map-side.\n"
    )

    p = plan_text(qs["q112_variant"](spark, SF))
    has_py = "Python" in p or "ArrowEval" in p
    sections.append(
        "## q112 — VARIANT path extraction stays JVM-side\n\n```\n"
        + grep(p, "HashAggregate", "ReadSchema", max_lines=4)
        + f"\n```\nPython nodes in the plan: **{'yes' if has_py else 'none'}** — "
        "parse_json/variant_get are codegen'd expressions, not UDFs; the scan "
        "reads only (event_type, props).\n"
    )

    p = plan_text(qs["q114_sequence_packing"](spark, SF))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE))
    has_single_part = "SinglePartition" in p
    sections.append(
        f"## q114 — sequence packing has no global ordering region\n\n"
        f"Exchanges: **{n_ex}**, SinglePartition exchange: "
        f"**{'yes' if has_single_part else 'none'}** — the prefix sum runs "
        "inside hash-partitioned buckets (one shuffle on the md5 shard key, "
        "then a per-bucket window sort); a global concat order would plan a "
        "single-partition window and serialize the corpus.\n"
    )

    p = plan_text(qs["q115_boilerplate_fraction"](spark, SF))
    sections.append(
        "## q115 — boilerplate screen via shingle inverted index\n\n```\n"
        + grep(p, "partial_count", "Exchange", "Generate", max_lines=6)
        + "\n```\nThe shingle document-frequency table partial-aggregates "
        "before its shuffle (hot boilerplate shingles collapse map-side); the "
        "join back to (doc, shingle) is the only data-sized exchange — no "
        "document-pair join exists in the plan.\n"
    )
    p = plan_text(qs["q130_bm25"](spark, SF))
    sections.append(
        "## q130 — BM25: postings filtered before the tf shuffle\n\n```\n"
        + grep(p, r"IN \(vector", "partial_count", r"^\(\d+\) Generate", max_lines=6)
        + "\n```\nThe `isin(query_terms)` filter sits directly above the "
        "explode and below the (doc, term) aggregation: the tf shuffle "
        "carries only rows mentioning a query term — at corpus scale the "
        "shuffled relation is the query terms' postings, not the token "
        "stream. df/corpus stats ride broadcasts.\n"
    )

    p = plan_text(qs["q132_dq_report"](spark, SF))
    n_scan = len(re.findall(r"^\(\d+\) Scan parquet", p, re.MULTILINE))
    sections.append(
        f"## q132 — DQ report compiles to ONE scan\n\nparquet scans in the "
        f"plan: **{n_scan}** — completeness/uniqueness/accepted-values/"
        "pattern/range all evaluate as conditional aggregates over a single "
        "pass (the naive one-query-per-constraint form scans 5×); the "
        "count_distinct rewrites to a two-level keyed aggregation over the "
        "already-pruned columns (partial per o_orderkey, then merge), not "
        "a second scan.\n"
    )

    p = plan_text(qs["q133_pq_ann"](spark, SF))
    n_py = len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.MULTILINE))
    sections.append(
        f"## q133 — PQ recall check: vectorized Python stages only\n\n"
        f"ArrowEvalPython stages: **{n_py}** — the frozen-codebook encode "
        "UDF (once per plan branch that reads the codes relation) and the "
        "LUT-ADC scorer, whose input projection is (code, query_id): the "
        "64-double query vector never crosses the Arrow boundary per "
        "candidate pair (the formulation that shipped it measured 13.2 s "
        "vs 8.1 s at sf0.1). Exact cosine, both windows, and the recall "
        "aggregate are JVM expressions; no row-at-a-time Python exists.\n"
    )

    p = plan_text(qs["q134_countmin_heavy_hitters"](spark, SF))
    sections.append(
        "## q134 — count-min sketch aggregates map-side\n\n```\n"
        + grep(p, "partial_count", "Exchange hashpartitioning", max_lines=6)
        + "\n```\nThe d×256-counter sketch partial-aggregates below its "
        "exchange — KBs cross the shuffle regardless of input size; the "
        "estimate joins are broadcasts of the sketch.\n"
    )

    p = plan_text(qs["q140_equidepth_histogram"](spark, SF))
    n_range_on_v = len(re.findall(r"rangepartitioning\(_?_?v", p, re.IGNORECASE))
    sections.append(
        f"## q140 — equi-depth histogram without a global sort\n\n"
        f"rangepartitioning exchanges on the value column: **{n_range_on_v}** — "
        "the global rank composes from value-range partitions + local "
        "row_number + broadcast offsets; the only range exchange in the plan "
        "orders the 10 result rows, and the only SinglePartition window runs "
        "over the 64-row offsets table.\n"
    )

    # ---- round-4 sections ------------------------------------------------
    # (these counts parse executedPlan().toString() — explain("formatted")
    # separates node args from the tree, so argument regexes miss there)

    def plan_str(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan_str(qs["q148_bloom_join_pruning"](spark, SF))
    n_x_orders = len(re.findall(r"Exchange hashpartitioning\(o_", p))
    sections.append(
        f"## q148 — Bloom prefilter is scan-side\n\n"
        f"hash Exchanges partitioning on orders columns: **{n_x_orders}** — "
        "the probe side evaluates k element_at probes against the broadcast "
        "dense bitmap at the scan; non-matching fact rows never reach an "
        "exchange. The only aggregations in the plan build the (<= m row) "
        "position set and the final one-row counters.\n"
    )

    p = plan_str(qs["q150_funnel"](spark, SF))
    n_agg_ex = len(re.findall(r"Exchange hashpartitioning\(user_id", p))
    sections.append(
        f"## q150 — funnel is ONE user-keyed shuffle\n\n```\n"
        + grep(p, r"Exchange hashpartitioning\(user_id", "aggregate", max_lines=4)
        + f"\n```\nuser_id hash Exchanges: **{n_agg_ex}** (partial_collect_list "
        "combines map-side; the k-step fold runs as one expression over each "
        "user's sorted events — the naive join-chain plans k of these).\n"
    )

    p = plan_str(qs["q152_peak_concurrency"](spark, SF))
    n_range_t = len(re.findall(r"Exchange rangepartitioning\(t#", p))
    sections.append(
        f"## q152 — sweep line without a global data sort\n\n"
        f"rangepartitioning exchanges on the boundary timestamps: **{n_range_t}** "
        "— running sums sort inside hour partitions; the only unpartitioned "
        "window runs over the ~721-row hour table (carry-in offsets).\n"
    )

    p = plan_str(qs["q157_kmeans_exact"](spark, SF))
    n_joins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p))
    sections.append(
        f"## q157 — k-means assignment without a centroids join\n\n"
        f"joins in the final-round plan: **{n_joins}** — centroids ride the "
        "plan as k x d literals inside the argmin expression; the only "
        "exchange aggregates the per-cell summary.\n"
    )

    from snowflake_cdc_spark.operators.ivm import BucketSpec, JoinViewMaintainer

    m = JoinViewMaintainer(
        "fk", "jk", "dk", bucket_spec=BucketSpec(prefix="plans_ivm", buckets=8)
    )
    try:
        fcols = "fk int, jk int, val string, seq bigint, is_delete boolean"
        dcols = "dk int, attr string, seq bigint, is_delete boolean"
        m.apply_batch(
            spark.createDataFrame(
                [(i, 10 * (1 + i % 3), f"v{i}", 1, False) for i in range(500)], fcols
            ),
            spark.createDataFrame(
                [(10, "x", 1, False), (20, "y", 1, False), (30, "z", 1, False)], dcols
            ),
        )
        m.apply_batch(
            spark.createDataFrame([(1, 20, "v1b", 2, False)], fcols),
            spark.createDataFrame([(20, "y2", 2, False)], dcols),
        )
        sections.append(
            f"## bucketed IVM — 0-Exchange maintenance\n\n"
            f"shuffle Exchanges in the batch-2 recompute+splice plan: "
            f"**{m.last_exchange_count}** — fact/dim/view read from co-located "
            "bucketed tables, change-driven key sets broadcast; the per-batch "
            "hash clustering happens once at the bucketed writes.\n"
        )
    finally:
        m.drop_bucketed_tables()

    n_l, n_r = 20_000_000, 2_000_000
    lhs = spark.range(n_l).select(
        F.when(F.col("id") % 10 < 3, F.col("id") % 97)
        .otherwise(F.col("id") % 500_000)
        .alias("user_id"),
        F.col("id").alias("ts"),
        F.col("id").alias("event_id"),
    )
    rhs = spark.range(n_r).select(
        (F.col("id") % 500_000).alias("user_id"),
        (F.col("id") * 10).alias("ts"),
        F.col("id").alias("purchase_id"),
    )
    t0 = time.perf_counter()
    # aggregate over the matched column so Catalyst cannot prune the window
    cnt = (
        asof_join(
            lhs, rhs, "user_id", "ts", "ts", {"purchase_id": "pid"},
            tie_col="purchase_id",
        )
        .agg(F.count("pid"))
        .collect()[0][0]
    )
    dt = time.perf_counter() - t0
    sections.append(
        f"## scaling probe — as-of join, {n_l/1e6:.0f}M × {n_r/1e6:.0f}M rows\n\n"
        f"30% of left rows on 97 hot users. Matched left rows: {cnt:,}; wall-clock "
        f"on local[32]: **{dt:.1f} s** (~{(n_l+n_r)/dt/1e6:.0f}M rows/s through "
        "the union-window). A pairwise range-join formulation at the same "
        "scale would build ~40× the intermediate rows before its dedup.\n"
    )

    # scaling probe: Bloom prefilter over 50M synthetic probe rows
    n_p, n_d = 50_000_000, 2_000
    from snowflake_cdc_spark.operators.bloom import bloom_prefilter, build_bloom

    dim = spark.range(n_d).select((F.col("id") * 7).alias("k"))
    probe = spark.range(n_p).select((F.col("id") % 3_000_000).alias("k"))
    bloom = build_bloom(dim, "k", k=4, m=65536)
    t0 = time.perf_counter()
    kept = bloom_prefilter(probe, "k", bloom, k=4, m=65536).count()
    dt = time.perf_counter() - t0
    sections.append(
        f"## scaling probe — Bloom prefilter, {n_p/1e6:.0f}M probe rows\n\n"
        f"m=65536 bits, k=4, {n_d:,} dim keys (~12% fill). Kept "
        f"{kept:,}/{n_p:,} rows ({kept/n_p:.2%}) in **{dt:.1f} s** on "
        f"local[32] (~{n_p/dt/1e6:.0f}M rows/s through the scan-side "
        "filter — 4 md5s + 4 O(1) bitmap probes per row, ZERO exchanges "
        "on the probe side). At this dim size a broadcast semi-join "
        "also works — the filter's regime is dim key sets too big to "
        "broadcast while m bits still fit; this probe measures the "
        "scan-side form's throughput and selectivity.\n"
    )

    # scaling probe: funnel fold over 30M synthetic events
    from snowflake_cdc_spark.operators.funnel import funnel_counts

    n_e = 30_000_000
    ev = spark.range(n_e).select(
        (F.col("id") % 2_000_000).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("view"), F.lit("click"),
                    F.lit("purchase"), F.lit("other")),
            (F.pmod(F.hash("id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
    )
    t0 = time.perf_counter()
    rows = funnel_counts(ev, ["view", "click", "purchase"]).collect()
    dt = time.perf_counter() - t0
    sections.append(
        f"## scaling probe — funnel fold, {n_e/1e6:.0f}M events x 2M users\n\n"
        f"steps reached: {[int(r.n_users) for r in rows]}; wall-clock "
        f"on local[32]: **{dt:.1f} s** (~{n_e/dt/1e6:.0f}M events/s through "
        "the single user-keyed shuffle + per-user fold; the k-join naive "
        "form scans and shuffles the event table three times).\n"
    )

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
