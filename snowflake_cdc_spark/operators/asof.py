"""As-of join: enrich each left row with the most recent right row at or
before its timestamp, per key.

Spark has no built-in as-of join (pandas ``merge_asof`` exists only
driver-side). The naive distributed formulations are both wrong at scale:

* equi-join on key + range predicate + latest-per-pair explodes to
  |left| x |right-rows-per-key| intermediate rows before the window
  prunes them;
* a correlated scalar subquery per left row is not expressible in the
  DataFrame API at all.

This implementation is the single-shuffle union-merge: tag both sides,
union them into one stream of (key, ts, side) rows, sort within each key
partition once, and carry the latest right payload forward with
``last(payload, ignorenulls=True)`` over an unbounded-preceding running
frame. Cost is one shuffle of |left| + |right| rows on the join key and
one per-key sort — the same cost profile as a windowed dedup, with no
intermediate blow-up. At 100 TB this is the plan you want: both sides
partition by key, AQE handles skewed keys, and nothing is ever
materialized per (left, right) pair.

Semantics (deterministic):

* ``strict=True``  -> right.ts <  left.ts (a right row exactly at the
  left row's timestamp is NOT visible);
* ``strict=False`` -> right.ts <= left.ts;
* among right rows sharing the winning timestamp, the greatest
  ``tie_col`` value wins.

The reference has no as-of operator (SURVEY.md §2.5: joins are absent
from the reference surface); this is part of the declared engine core
needed by the analytics harness and by training-data pipelines
(point-in-time-correct feature lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: dict[str, str],
    tie_col: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Return ``left`` with ``value_cols`` from the as-of matching right row.

    Parameters
    ----------
    on: equi-join key column(s), same names on both sides.
    left_ts / right_ts: event-time columns (any orderable type).
    value_cols: {right_col: output_alias} payload to carry over; aliases
        must not collide with left columns. NULL when no right row
        precedes the left row.
    tie_col: right column breaking ties among equal ``right_ts`` values
        (greatest wins). Required for determinism if right may hold
        duplicate timestamps per key.
    strict: if True the match requires ``right_ts < left_ts``, else
        ``<=``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(*[F.col(c).alias(a) for c, a in value_cols.items()])

    # Side ordering at equal timestamps decides visibility: the running
    # frame ends at the current row, so a right row sorted *after* the
    # left row at the same ts is invisible (strict) and one sorted
    # *before* is visible (inclusive).
    left_side, right_side = (0, 1) if strict else (1, 0)

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_side).alias("_asof_side"),
        (F.col(tie_col) if tie_col is not None else F.lit(0)).alias("_asof_tie"),
        payload.alias("_asof_payload"),
    )
    l = left.select(
        F.struct(*left.columns).alias("_asof_row"),
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(left_side).alias("_asof_side"),
        # left rows never share a _asof_side value with right rows, so their
        # tie value is inert — but it must union-coerce to the right type
        F.lit(None).cast(r.schema["_asof_tie"].dataType).alias("_asof_tie"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    r = r.select(
        F.lit(None).cast(l.schema["_asof_row"].dataType).alias("_asof_row"),
        *r.columns,
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side", "_asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_asof_row.{c}").alias(c) for c in left.columns] + [
        F.col(f"_asof_match.{a}").alias(a) for a in value_cols.values()
    ]
    return merged.filter(F.col("_asof_row").isNotNull()).select(*out_cols)
