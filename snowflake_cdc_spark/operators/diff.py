"""Snapshot diff (CDC data-diff): what changed between two points of the
change log.

The reference materializes latest-by-key snapshots (add_output.py
SetIsDelete/row_number posture, see operators/upsert.py); the natural
inspection surface over that lifecycle — the one every CDC migration
validates with — is "diff the table as of seq ≤ s1 against seq ≤ s2":
which keys were added, removed, or changed, and which columns changed.

Plan shape (the 100 TB part): a naive diff builds two snapshots (two
shuffles) and full-outer-joins them (a third). Here both as-of states
are computed in ONE hash aggregation — ``max_by(payload, seq)`` for the
s2 state and ``max_by(payload, CASE WHEN seq <= s1 THEN seq END)`` for
the s1 state (``max_by`` skips rows whose ordering key is NULL, so the
conditional ordering key IS the horizon filter) — one shuffle on the
key, map-side partial aggregation, no join at all. Column comparison is
then a per-row expression over the two structs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "table_diff"]


def snapshot_diff(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    s1: Column | int,
    s2: Column | int | None = None,
    seq_col: str = "seq",
    is_delete_col: str = "is_delete",
) -> DataFrame:
    """Row-level diff of the hard-delete snapshot at ``s1`` vs at ``s2``.

    ``s1``/``s2`` are sequence horizons — ints or Columns (e.g. a scalar
    joined in by a broadcast cross join, the house pattern for
    data-derived horizons); ``s2=None`` means the full log. Output one
    row per key whose state differs: ``key_cols…, change_type``
    ('added' | 'removed' | 'changed'), ``changed_cols`` (sorted array of
    differing value columns, NULL-safe compare; empty for added/removed),
    ``n_changed_cols``. Keys absent (or deleted) at both horizons emit
    nothing."""
    s1c = F.lit(s1) if isinstance(s1, int) else s1
    seq = F.col(seq_col)
    payload = F.struct(
        *[F.col(c) for c in value_cols], F.col(is_delete_col).alias("__del")
    )
    scoped = changes if s2 is None else changes.filter(
        seq <= (F.lit(s2) if isinstance(s2, int) else s2)
    )
    agg = scoped.groupBy(*key_cols).agg(
        F.max_by(payload, F.when(seq <= s1c, seq)).alias("__a"),
        F.max_by(payload, seq).alias("__b"),
    )
    present_a = F.col("__a").isNotNull() & ~F.col("__a.__del")
    present_b = F.col("__b").isNotNull() & ~F.col("__b.__del")
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__a.{c}").eqNullSafe(F.col(f"__b.{c}")), F.lit(c)
                )
                for c in sorted(value_cols)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        agg.withColumn(
            "change_type",
            F.when(present_a & ~present_b, F.lit("removed"))
            .when(~present_a & present_b, F.lit("added"))
            .when(present_a & present_b & (F.size(changed_cols) > 0), F.lit("changed")),
        )
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change_type") == "changed", changed_cols).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .withColumn("n_changed_cols", F.size("changed_cols"))
        .drop("__a", "__b")
    )

# ---------------------------------------------------------------------------
# table_diff (round 6): the TWO-RELATION diff — source vs sink, yesterday's
# snapshot vs today's. snapshot_diff above answers "what changed between two
# horizons of ONE change log" with zero joins; table_diff answers "do these
# two materializations agree" when the inputs are independent tables, with
# ONE full-outer key join + ONE aggregation computing every per-column
# NULL-safe change count simultaneously (never a shuffle per column),
# unpivoted into a (metric, n) report:
#
# - rows_added / rows_removed / rows_common  — key presence;
# - rows_changed            — common keys where ANY compared column differs;
# - col_changed:<name>      — common keys where that column differs.
# ---------------------------------------------------------------------------


def table_diff(
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
    # key-only diff (no shared non-key columns, or an explicit []):
    # rows_added/removed/common are still meaningful; nothing can count
    # as changed — without the literal fallback the coalesce below would
    # receive a Python None and fail at plan-build time (ADVICE r06)
    any_neq = F.lit(False) if not compare_cols else None
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
