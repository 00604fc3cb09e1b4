"""Deequ-style data-quality expectation checking in ONE scan.

A CDC replication pipeline (reference: MySQL -> Snowflake,
``add_output.py:421-448``) needs continuous verification that the
materialized tables still honor their contracts — completeness,
key uniqueness, accepted values, pattern conformance, range bounds.
The naive form runs one query per constraint (N scans of a 100 TB
table); this operator compiles every constraint into a single
aggregation pass: one job, one scan, each constraint a conditional
aggregate, then an unpivot of the 1-row result into a
constraint-per-row report.

Determinism: every metric is an exact BIGINT pair (n_pass, n_total)
with at most one final double division; ``passed`` is an integer
comparison against the exact counts — no float thresholds anywhere.

Note on uniqueness: ``count_distinct`` inside the same aggregate makes
Catalyst rewrite to a two-level keyed aggregation (partial per key,
then merge — one extra reduce over the already column-pruned data, NOT
a second table scan); the scan itself stays single, plan-asserted in
``test_governance.py::TestDqReport::test_single_scan_plan``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    """One constraint: ``name`` + a predicate column counted over the
    table (``pred`` is None for uniqueness, handled specially)."""

    name: str
    pred: Column | None = None
    distinct_col: str | None = None


def not_null(col: str) -> Expectation:
    return Expectation(f"completeness_{col}", F.col(col).isNotNull())


def unique(col: str) -> Expectation:
    return Expectation(f"uniqueness_{col}", None, distinct_col=col)


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(f"accepted_values_{col}", F.col(col).isin(values))


def matches_pattern(col: str, pattern: str) -> Expectation:
    return Expectation(f"pattern_{col}", F.col(col).rlike(pattern))


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(f"range_{col}", F.col(col).between(lo, hi))


def row_gate(
    df: DataFrame,
    expectations: list[Expectation],
    exempt: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (passing, violating) by the conjunction of
    row-level expectations — the gating counterpart of ``dq_report``
    (which only measures). Aggregate-level expectations (uniqueness)
    have no per-row truth value and are rejected.

    ``exempt`` rows pass unconditionally — the CDC pipeline passes
    ``is_delete`` here, because a delete event's after-image is
    legitimately NULL and must not be quarantined by a completeness
    check on a payload column.

    Nulls follow SQL semantics pessimistically: a predicate evaluating
    to NULL counts as a violation (``coalesce(pred, false)``), so a
    NULL value cannot slip through an accepted-values or range check.
    """
    if not expectations:
        raise ValueError("row_gate requires at least one expectation")
    preds = []
    for e in expectations:
        if e.distinct_col is not None:
            raise ValueError(
                f"{e.name}: uniqueness is aggregate-level; row_gate takes "
                "row-level expectations only"
            )
        preds.append(F.coalesce(e.pred, F.lit(False)))
    ok = preds[0]
    for p in preds[1:]:
        ok = ok & p
    if exempt is not None:
        ok = F.coalesce(exempt, F.lit(False)) | ok
    return df.filter(ok), df.filter(~ok)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column DISCOVERY profiling in ONE aggregation pass — the other
    half of data-quality tooling beside ``dq_report`` (which CHECKS
    expectations you already have; the profiler is how you find out what
    to expect: Deequ's ColumnProfilerRunner posture). Per column:
    ``(col_name, n_total, n_null, n_distinct, min_val, max_val)``, min
    and max computed on the NATIVE type then rendered to string (so
    numeric columns order numerically, not lexicographically).

    One scan regardless of column count: all metrics fold into a single
    ``agg`` (the multiple count_distincts plan as one Expand over the
    scan — still one pass over the data, the same trade
    grouping-sets/q64 makes), then an array-of-structs explode unpivots
    the 1-row result. ``n_distinct`` counts non-null values (SQL
    COUNT(DISTINCT) semantics, identical in DuckDB).

    Cross-engine rendering note (determinism contract): string casts of
    BIGINT/VARCHAR/DATE render identically in Spark and DuckDB;
    float/decimal rendering does NOT — oracle-checked profiles should
    select non-float columns (the operator itself takes any column)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"_null{i}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"_nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_total").alias("n_total"),
                F.col(f"_null{i}").alias("n_null"),
                F.col(f"_nd{i}").alias("n_distinct"),
                F.col(f"_min{i}").alias("min_val"),
                F.col(f"_max{i}").alias("max_val"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r")).select("r.*").orderBy("col_name")
    )


def dq_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in one aggregation pass. Returns
    ``(check_name, n_pass, n_total, ratio, passed)`` one row per
    expectation, ordered by check name."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    for i, e in enumerate(expectations):
        if e.distinct_col is not None:
            aggs.append(
                F.count_distinct(F.col(e.distinct_col)).cast("bigint").alias(f"_m{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(e.pred, F.lit(1)).otherwise(F.lit(0)))
                .cast("bigint")
                .alias(f"_m{i}")
            )
    one = df.agg(*aggs)

    report_rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("check_name"),
                F.col(f"_m{i}").alias("n_pass"),
                F.col("_total").alias("n_total"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    exploded = one.select(F.explode(report_rows).alias("r")).select("r.*")
    return exploded.select(
        "check_name",
        "n_pass",
        "n_total",
        (F.col("n_pass").cast("double") / F.col("n_total").cast("double")).alias(
            "ratio"
        ),
        (F.col("n_pass") == F.col("n_total")).alias("passed"),
    ).orderBy("check_name")
