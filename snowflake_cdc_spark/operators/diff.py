"""Snapshot diff audit — the CDC engine's own validation tool: given
two keyed snapshots (source vs sink, yesterday vs today, pre- vs
post-backfill), report what changed, column by column. This is the
check a pipeline operator runs after a replay/backfill to prove the
sink converged (reference parity: the reference lands CDC rows into
warehouse tables, `add_output.py:421-448`; this audits that landing
against any other materialization of the same table).

One full-outer join on the key, ONE aggregation pass computing every
per-column change count simultaneously (conditional sums — never a
shuffle per column), then a driver-tiny unpivot into the
(metric, n) report:

- ``rows_added`` / ``rows_removed`` / ``rows_common`` — key presence;
- ``rows_changed`` — common keys where ANY compared column differs;
- ``col_changed:<name>`` — common keys where that column differs
  (NULL-safe: ``NOT (a <=> b)``, so NULL→value and value→NULL count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(metric, n) change report between snapshot ``a`` (old) and
    ``b`` (new). ``compare_cols`` defaults to every shared non-key
    column."""
    if compare_cols is None:
        shared = [c for c in a.columns if c in set(b.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    al = a.select(
        *[F.col(k).alias(f"__ka_{k}") for k in key_cols],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(1).alias("__ina"),
    )
    bl = b.select(
        *[F.col(k).alias(f"__kb_{k}") for k in key_cols],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(1).alias("__inb"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ka_{k}") == F.col(f"__kb_{k}")
        cond = eq if cond is None else cond & eq
    j = al.join(bl, cond, "full_outer")
    common = F.col("__ina").isNotNull() & F.col("__inb").isNotNull()
    neq = {
        c: common & ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        for c in compare_cols
    }
    any_neq = None
    for c in compare_cols:
        any_neq = neq[c] if any_neq is None else any_neq | neq[c]
    agg = j.agg(
        F.sum(F.col("__ina").isNull().cast("bigint"))
        .cast("bigint")
        .alias("rows_added"),
        F.sum(F.col("__inb").isNull().cast("bigint"))
        .cast("bigint")
        .alias("rows_removed"),
        F.sum(common.cast("bigint")).cast("bigint").alias("rows_common"),
        F.sum(F.coalesce(any_neq, F.lit(False)).cast("bigint"))
        .cast("bigint")
        .alias("rows_changed"),
        *[
            F.sum(neq[c].cast("bigint"))
            .cast("bigint")
            .alias(f"col_changed:{c}")
            for c in compare_cols
        ],
    )
    metrics = ["rows_added", "rows_removed", "rows_common", "rows_changed"] + [
        f"col_changed:{c}" for c in compare_cols
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.coalesce(F.col(f"`{m}`"), F.lit(0)).alias("n"),
            )
            for m in metrics
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("p"))
        .select("p.metric", "p.n")
        .orderBy("metric")
    )
