#!/usr/bin/env python
"""Whole-registry PLAN audit (VERDICT r05 #2) — the standing gate that
keeps the single-partition global-window pattern extinct and every
cartesian product broadcast-guarded.

For every query in ``__spark_entry__.queries()`` the tool builds the
DataFrame at a small SF (planning only — no collect), walks the
PHYSICAL plan text (``executedPlan().toString()`` — the same source
``tools/dump_plans.py`` uses, because ``explain('formatted')`` elides
the argument lists the detectors need), and flags:

- ``Exchange SinglePartition`` whose CONSUMER is a Sort/Window chain —
  the serial region the round-5 verdict found at seven sites. Single-
  partition exchanges feeding a final global aggregate, a CollectLimit
  or a TakeOrderedAndProject merge are the normal scalar/limit
  finishers and pass.
- ``CartesianProduct`` (the non-broadcast nested loop). Broadcast
  nested-loop joins pass: the build side was provably small enough to
  ship.
- Python-boundary discipline (VERDICT r06 #5): ``BatchEvalPython``
  (the row-at-a-time Python UDF node) fails ANYWHERE — there is no
  whitelist for it; every Python boundary in this repo must be
  Arrow-batched. Arrow/pandas nodes (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``, ``MapInArrow``, …) fail
  unless the query is enumerated in ``PY_WHITELIST`` — the pandas
  ADC/assignment/multimodal lanes where the Python stage IS the
  operator.

Every flagged site must be covered by the WHITELIST below — an
enumerated, per-query budget of sites that are KNOWN constant-bounded
(bucket-offset tables of <= a few thousand rows whose size is fixed by
an operator parameter, never by the data; pre-limited top-k sets) or
where exhaustive pairing IS the semantics (recall-check lanes that
compare an ANN result against the true exhaustive answer). A new query
that introduces an unlisted global window or cartesian fails the audit
at commit time — the plan-discipline analogue of the determinism gate.

Usage: python tools/plan_audit.py [query_name ...]
Exit 0 = every flagged site whitelisted; exit 1 otherwise.
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

# query -> (max allowed sites, reason). A "site" is one flagged plan
# node (global-window exchange or cartesian). Budgets are exact ceilings
# — going over fails, and going UNDER is reported so stale entries get
# pruned.
WHITELIST: dict[str, tuple[int, str]] = {
    "q120_global_shuffle": (
        1,
        "bucket-offsets running sum over n_buckets=64 rows "
        "(operators/shuffle.py — size fixed by parameter, not data)",
    ),
    "q140_equidepth_histogram": (
        1,
        "bucket-offsets running sum over range_buckets=64 rows "
        "(operators/histogram.py)",
    ),
    "q152_peak_concurrency": (
        1,
        "carry-in running net over the HOUR-level table "
        "(operators/sweepline.py — timeline hours, not data rows)",
    ),
    "q166_skyline": (
        1,
        "frontier sweep over DISTINCT (price,size) VALUE PAIRS — the "
        "2-D skyline scan is inherently sequential in price order and "
        "runs on the deduplicated value-pair relation, never the data",
    ),
    "q174_zipf_slope": (
        1,
        "rank.py bucket-offsets window: <= exact_max*256 + ~57 rows "
        "regardless of vocabulary size",
    ),
    "q255_curriculum_schedule": (
        1,
        "equidepth_assign bucket-offsets window over <= 64 range-bucket "
        "rows (operators/histogram.py — size fixed by parameter); the "
        "K-row schedule tail is a collected literal, so the subtree "
        "appears once",
    ),
    # q187_woe_binning's two equidepth_assign bucket-offsets windows
    # (range_buckets=64 rows each) moved below a localCheckpoint in
    # round 11 — the audited final plan no longer contains them
    # (pruned per the stale-budget warn; the windows themselves are
    # unchanged and stay constant-bounded).
    "q188_skew_profile": (
        4,
        "one rank.py bucket-offsets window (<= 16.4k rows) per "
        "profiled join key (4 keys)",
    ),
    "q193_conversion_latency": (
        1,
        "rank.py bucket-offsets window over range_buckets=64 rows",
    ),
    "q203_shard_manifest": (
        1,
        "sharding.py bucket-offsets running sum over n_buckets=256 "
        "rows (the shuffle-rank offsets window lives inside the "
        "materialized checkpoint, audited via q120)",
    ),
    "q211_budget_selection": (
        1,
        "bucket-offsets running sum over 256 fixed range buckets (the "
        "q203 cumsum shape; the skewed_count_rank windows live inside "
        "the materialized checkpoint, audited via q174/q188)",
    ),
    "q218_shard_mixture": (
        1,
        "sharding.py bucket-offsets running sum over n_buckets=256 "
        "rows (same constant-bounded site as q203)",
    ),
    "q221_dsir_selection": (
        1,
        "bucket-offsets running sum over 256 fixed range buckets (the "
        "q211 selection cumsum verbatim; the skewed_count_rank windows "
        "live inside the materialized checkpoint, audited via "
        "q174/q188)",
    ),
    "q228_bootstrap_ci": (
        1,
        "order-statistics window over the replica-means table — "
        "exactly N_REPLICAS=32 rows regardless of corpus size",
    ),
    "q232_event_disorder": (
        1,
        "carry running max over the 256-row fixed arrival-bucket "
        "table (the q203 constant-bounded pattern)",
    ),
    "q233_corpus_grid": (
        2,
        "two equidepth_assign bucket-offsets windows (range_buckets=64 "
        "rows each — one per grid axis, the q187 pattern)",
    ),
    "q236_nb_pr_curve": (
        2,
        "one equidepth_assign bucket-offsets window (range_buckets=64 "
        "rows) + the 10-row band cumulative window (both "
        "constant-bounded by operator parameters, never by data)",
    ),
    "q238_nb_calibration": (
        1,
        "one equidepth_assign bucket-offsets window (range_buckets=64 "
        "rows — the q236 banding without the band cumsum)",
    ),
}


# query -> (max allowed Arrow-python sites, reason). Row-UDF
# (BatchEvalPython) sites are NEVER whitelistable. Every entry below is
# a lane where the Arrow-batched Python stage IS the operator (decode,
# ADC lookup, vectorized assignment) — not an expression that belongs
# in JVM codegen.
PY_WHITELIST: dict[str, tuple[int, str]] = {
    "q34_multimodal_features": (
        1,
        "mapInPandas media decode — the multimodal boundary is the lane",
    ),
    "q52_ivf_ann": (
        1,
        "vectorized pandas_udf centroid assignment (operators/ivf.py)",
    ),
    "q52b_ivf_full_probe": (
        2,
        "pandas_udf assignment on both the corpus and the exhaustive "
        "probe side",
    ),
    "q68_pandas_cosine": (
        1,
        "the scalar pandas_udf demonstration lane (SURVEY §2.8 UDF "
        "surface) — the Arrow boundary is the subject under test",
    ),
    "q69_grouped_pandas_norm": (
        1,
        "applyInPandas grouped normalization — ditto",
    ),
    "q133_pq_ann": (
        2,
        "pandas_udf PQ encode + vectorized ADC lookup (operators/pq.py; "
        "site count varies 0-2 with whether the codebook stage is "
        "already materialized when the plan is built)",
    ),
    "q144_ivfpq_ann": (
        2,
        "pandas_udf IVF assignment + vectorized ADC lookup "
        "(operators/ivfpq.py)",
    ),
    "q52c_ivf_ann_panel": (
        1,
        "vectorized pandas_udf centroid assignment (operators/ivf.py — "
        "the q52 lane on the fixed 128-query panel)",
    ),
    "q133c_pq_ann_panel": (
        2,
        "pandas_udf PQ encode + vectorized ADC lookup (the q133 lane "
        "on the fixed 128-query panel)",
    ),
    "q144c_ivfpq_ann_panel": (
        2,
        "pandas_udf IVF assignment + vectorized ADC lookup (the q144 "
        "lane on the fixed 128-query panel)",
    ),
    "q163_media_roundtrip": (
        2,
        "mapInPandas BMP decode + re-encode stages "
        "(operators/multimodal.py)",
    ),
    "q186_audio_frame_energy": (
        3,
        "mapInPandas WAV decode + frame-energy stages "
        "(operators/multimodal.py)",
    ),
}


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# lazy prefix + a node text that can't start with a tree-drawing char,
# so ":- Node" parses as marker+Node (not a skipped-marker "- Node")
# and ":   +- Node" branch-continuation prefixes are consumed as prefix
_NODE_RE = re.compile(r"^([ :|]*?)(?:([+:])- )?([^\s:+].*)$")


def _parse(plan: str) -> list[tuple[int, str]]:
    """(depth, node-text) per line of a physical-plan tree dump."""
    out = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = _NODE_RE.match(line)
        if m is None:  # pure tree-connector line (":", ": :", …)
            continue
        prefix, marker, rest = m.group(1), m.group(2), m.group(3)
        depth = len(prefix) + (3 if marker else 0)
        out.append((depth, rest.strip()))
    return out


def _name(node: str) -> str:
    node = re.sub(r"^\*\(\d+\) ", "", node)  # whole-stage-codegen star
    return node.split(" ", 1)[0].split("(", 1)[0]


_PASS_PARENTS = {
    # single-partition exchange feeding these is a scalar/limit finisher
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "CollectLimit",
    "GlobalLimit",
    "TakeOrderedAndProject",
}
_WINDOW_NODES = {"Window", "WindowGroupLimit", "WindowInPandas"}

# row-at-a-time Python UDF evaluation — the slow path, banned outright
_ROW_UDF_NODES = {"BatchEvalPython"}
# Arrow-batched Python boundaries — allowed only in whitelisted lanes
_ARROW_NODES = {
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
    "WindowInPandas",
}


def audit_plan(plan: str) -> list[str]:
    """Flagged sites (human-readable) in one physical plan dump."""
    nodes = _parse(plan)
    flags = []

    def parent_chain(i: int):
        d = nodes[i][0]
        for j in range(i - 1, -1, -1):
            if nodes[j][0] < d:
                d = nodes[j][0]
                yield _name(nodes[j][1])

    for i, (_, node) in enumerate(nodes):
        nm = _name(node)
        if nm == "Exchange" and "SinglePartition" in node:
            # effective consumer: walk ancestors, skipping pass-through
            # Project/Filter; note whether a Sort intervenes
            sort_seen = False
            consumer = "<root>"
            for anc in parent_chain(i):
                if anc in ("Project", "Filter"):
                    continue
                if anc == "Sort":
                    sort_seen = True
                    continue
                consumer = anc
                break
            if consumer in _WINDOW_NODES:
                flags.append(
                    f"global-window: Exchange SinglePartition -> {consumer}"
                )
            elif sort_seen:
                # a single-partition Sort is a serial region no matter
                # what consumes it (a true top-k compiles to
                # TakeOrderedAndProject with NO such exchange)
                flags.append(
                    f"global-sort: Exchange SinglePartition -> Sort -> {consumer}"
                )
            elif consumer not in _PASS_PARENTS:
                flags.append(
                    f"single-partition: Exchange SinglePartition -> {consumer}"
                )
        elif nm == "CartesianProduct":
            flags.append("cartesian: CartesianProduct")
        elif nm in _ROW_UDF_NODES:
            flags.append(
                f"row-udf: {nm} (row-at-a-time Python UDF — use a "
                "pandas_udf / mapInPandas boundary instead)"
            )
        elif nm in _ARROW_NODES:
            flags.append(f"arrow-python: {nm}")
    return flags


def main(argv: list[str]) -> int:
    from snowflake_cdc_spark.session import get_spark

    entry = _load_entry()
    spark = get_spark(app_name="plan_audit")
    qs = entry.queries()
    names = argv or sorted(qs)
    bad = []
    audited = 0
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, don't mask
            bad.append((name, [f"plan build failed: {e}"]))
            continue
        flags = audit_plan(plan)
        audited += 1
        plan_flags = [f for f in flags if not f.startswith(("row-udf", "arrow-python"))]
        row_flags = [f for f in flags if f.startswith("row-udf")]
        arrow_flags = [f for f in flags if f.startswith("arrow-python")]

        over = []
        allowed, reason = WHITELIST.get(name, (0, ""))
        if len(plan_flags) > allowed:
            over += plan_flags[allowed:] if allowed else plan_flags
        pallowed, preason = PY_WHITELIST.get(name, (0, ""))
        if len(arrow_flags) > pallowed:
            over += arrow_flags[pallowed:] if pallowed else arrow_flags
        over += row_flags  # no whitelist for row-at-a-time UDFs

        if over:
            bad.append((name, over))
            print(f"FAIL {name}: {len(over)} unlisted site(s)")
            for f in over:
                print(f"     - {f}")
        elif flags:
            parts = []
            if plan_flags:
                parts.append(f"{len(plan_flags)} plan [{reason}]")
            if arrow_flags:
                parts.append(f"{len(arrow_flags)} arrow-python [{preason}]")
            print(f"ok   {name}: whitelisted {'; '.join(parts)}")
        if allowed and len(plan_flags) < allowed:
            print(
                f"warn {name}: whitelist budget {allowed} > observed "
                f"{len(plan_flags)} — prune the stale entry"
            )
        if pallowed and len(arrow_flags) < pallowed:
            print(
                f"warn {name}: PY whitelist budget {pallowed} > observed "
                f"{len(arrow_flags)} — prune the stale entry"
            )
    print(
        f"\n{audited} plans audited, {len(bad)} with unlisted "
        f"global-window/global-sort/cartesian/python-boundary sites"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
