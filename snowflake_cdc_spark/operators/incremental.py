"""Incremental aggregate maintenance over a CDC retraction stream.

The reference materializes *tables* from CDC (SURVEY.md §2.3); an
analytics engine also wants maintained *aggregates* — grouped counts and
sums that stay in sync with upserts and deletes without recomputing from
the snapshot. Because every CDC event carries a before-image
(``data.old_row``, README.md:22), each event converts to signed
"retraction algebra" rows (the classic changelog/retract-stream model):

- insert  → (+ after-image)
- update  → (+ after-image, − before-image)
- delete  → (− before-image)

Grouped signed sums of these rows are *exactly* the delta of the grouped
aggregate, for any grouping — so maintenance is: aggregate the batch's
signed rows (tiny), then merge into the state table with one outer join
on the group key. Work per batch is O(batch + touched groups),
independent of history size.

Correctness bounds (documented, tested):
- Requires effectively-once event delivery (checkpointed micro-batches).
  Unlike the idempotent seq-guarded snapshot merge (sinks/parquet_sink),
  re-applying a retraction batch double-counts — same contract as any
  retract-stream system.
- Sums are computed in DECIMAL so incremental results are bit-identical
  to a full recompute regardless of batching/order (addition is exact
  and commutative; float sums would drift).

Scale posture: the grouped per-batch delta is usually tiny → Spark
broadcasts it against the (larger) state in the merge join; state stays
partitioned by group key, so repeated maintenance shuffles only deltas,
never the state. Groups that return to a true zero (count and all sums)
are evicted so deleted keys don't accrete; negative intermediates are
retained — they are legal states when delete batches land before their
matching inserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEC = T.DecimalType(18, 2)


def retraction_stream(
    flat_events: DataFrame, payload_cols: list[str]
) -> DataFrame:
    """Convert flat CDC events (``row_*`` / ``old_row_*`` / ``is_delete``
    columns, sources/cdc.py flat form) into signed image rows.

    Output: one column per payload col (unprefixed) + ``_sign`` (+1/-1).
    Before-images fall back to the after-image per column (the natural-key
    delete case where only ``row_*`` carries the final state — the same
    coalesce the pipeline applies for delete keys, controller.py).
    """
    plus = flat_events.filter(~F.col("is_delete")).select(
        *[F.col(f"row_{c}").alias(c) for c in payload_cols],
        F.lit(1).alias("_sign"),
    )
    before_present = F.lit(False)
    for c in payload_cols:
        before_present = before_present | F.col(f"old_row_{c}").isNotNull()
    minus = flat_events.filter(F.col("is_delete") | before_present).select(
        *[
            F.coalesce(F.col(f"old_row_{c}"), F.col(f"row_{c}")).alias(c)
            for c in payload_cols
        ],
        F.lit(-1).alias("_sign"),
    )
    return plus.unionByName(minus)


def _delta_agg(
    signed: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    aggs = [F.sum("_sign").cast("long").alias("n")] + [
        F.sum(F.col(c).cast(DEC) * F.col("_sign")).cast(DEC).alias(f"sum_{c}")
        for c in sum_cols
    ]
    return signed.groupBy(*group_cols).agg(*aggs)


def update_aggregate(
    prev: DataFrame | None,
    signed_batch: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge one batch of signed image rows into the maintained aggregate.

    ``prev`` is the current state (columns: group_cols + n + sum_<c>), or
    None for an empty state. Returns the next state. The batch aggregates
    map-side before the merge; the state joins on the group key (delta
    side broadcast-eligible when small).
    """
    # Eviction: a group leaves the state only when it is a true zero
    # (count AND all sums) — negative intermediates are legal retraction
    # states (a batch of deletes can arrive before the matching inserts
    # under cross-partition batching) and must be retained.
    def _live(df: DataFrame) -> DataFrame:
        zero = F.col("n") == 0
        for c in sum_cols:
            zero = zero & (F.col(f"sum_{c}") == F.lit(0).cast(DEC))
        return df.filter(~zero)

    delta = _delta_agg(signed_batch, group_cols, sum_cols)
    if prev is None:
        return _live(delta)
    p, d = prev.alias("p"), delta.alias("d")
    merged_cols = [
        (
            F.coalesce(F.col(f"p.{col_}"), F.col(f"d.{col_}")).alias(col_)
        )
        for col_ in group_cols
    ]
    n = (
        F.coalesce(F.col("p.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
    ).cast("long")
    sums = [
        (
            F.coalesce(F.col(f"p.sum_{c}"), F.lit(0).cast(DEC))
            + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0).cast(DEC))
        )
        .cast(DEC)
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return _live(
        p.join(d, group_cols, "full_outer").select(
            *merged_cols, n.alias("n"), *sums
        )
    )


def aggregate_from_retractions(
    flat_events: DataFrame,
    payload_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    n_chunks_by: str | None = None,
) -> DataFrame:
    """Maintained aggregate over a whole flat CDC log.

    With ``n_chunks_by`` (a column, e.g. ``op``), the log is applied as
    one batch per distinct value — exercising true multi-batch
    maintenance; result is independent of the chunking (signed addition
    is commutative and exact in DECIMAL).
    """
    signed_all = retraction_stream(flat_events, payload_cols)
    if n_chunks_by is None:
        return update_aggregate(None, signed_all, group_cols, sum_cols)
    chunks = [
        r[0]
        for r in flat_events.select(n_chunks_by).distinct().orderBy(n_chunks_by).collect()
    ]
    state: DataFrame | None = None
    for value in chunks:
        batch = retraction_stream(
            flat_events.filter(F.col(n_chunks_by) == value), payload_cols
        )
        state = update_aggregate(state, batch, group_cols, sum_cols)
    assert state is not None
    return state
