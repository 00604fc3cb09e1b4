"""Incremental maintenance of a JOIN view — the second classic IVM half
(``operators/incremental.py`` maintains grouped AGGREGATES; this
maintains a materialized fact⋈dimension join) under CDC upserts and
deletes on BOTH sides.

Strategy: **delta-key recompute**. Per batch:

1. merge each side's keyed snapshot with its (latest-by-key reduced)
   change set — the same upsert semantics as the table materializer;
2. the affected view keys are exactly (a) fact keys touched by ΔA and
   (b) fact keys whose join column points at a dimension key touched by
   ΔB (found with one semi-join of the fact snapshot against ΔB's keys);
3. splice: ``V' = (V anti-join affected) ∪ (A'[affected] ⋈ B')``.

Work per batch is O(|ΔA| + fact-rows-referencing-changed-dims +
|touched keys|) — independent of view size except the anti-join splice,
which is the same partitioned-merge cost class as the snapshot sink.
The dimension-side fan-out (one changed dim row may touch many fact
rows) is inherent to join maintenance, not to this algorithm; at
warehouse scale the fact snapshot is partitioned/bucketed by the join
column so step 2's semi-join prunes partitions.

Deletes cascade correctly by construction: a deleted fact key leaves
``affected`` with no recomputed row; a deleted dimension key makes the
inner join drop every fact row that referenced it.

Determinism: pure keyed set algebra — no floats, no order dependence;
the maintained view is bit-identical to a from-scratch join of the
final snapshots (asserted per batch in tests and by the q139 oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from snowflake_cdc_spark.operators.upsert import latest_by_key


class JoinViewMaintainer:
    """Maintains ``view = fact ⋈_{fact.join_col = dim.dim_key} dim``.

    Change sets are flat keyed rows carrying ``is_delete`` and a ``seq``
    for latest-by-key reduction (the pipeline's change-row shape)."""

    def __init__(
        self,
        fact_key: str,
        join_col: str,
        dim_key: str,
        seq_col: str = "seq",
        delete_col: str = "is_delete",
    ) -> None:
        self.fact_key, self.join_col, self.dim_key = fact_key, join_col, dim_key
        self.seq_col, self.delete_col = seq_col, delete_col
        self.fact: DataFrame | None = None
        self.dim: DataFrame | None = None
        self.view: DataFrame | None = None

    # -- keyed snapshot merge (upsert + hard delete) ----------------------

    def _merge(self, snap: DataFrame | None, changes: DataFrame, key: str) -> DataFrame:
        latest = latest_by_key(changes, [key], self.seq_col)
        live = latest.filter(~F.col(self.delete_col)).drop(
            self.delete_col, self.seq_col
        )
        if snap is None:
            return live
        survivors = snap.join(latest.select(key), key, "left_anti")
        return survivors.unionByName(live)

    def apply_batch(
        self, fact_changes: DataFrame | None, dim_changes: DataFrame | None
    ) -> DataFrame:
        """Apply one micro-batch of changes (either side may be None) and
        return the maintained view."""
        dim_touched = None
        if dim_changes is not None:
            dim_touched = dim_changes.select(self.dim_key).distinct()
            self.dim = self._merge(self.dim, dim_changes, self.dim_key)
        fact_touched = None
        if fact_changes is not None:
            fact_touched = fact_changes.select(self.fact_key).distinct()
            self.fact = self._merge(self.fact, fact_changes, self.fact_key)
        if self.fact is None or self.dim is None:
            # contract: the first batch seeds BOTH sides (an empty change
            # frame is fine); maintaining half a join has no defined view
            raise ValueError("apply_batch before both sides were seeded")

        # affected fact keys: touched directly, or referencing a touched dim
        affected = fact_touched
        if dim_touched is not None:
            via_dim = self.fact.join(
                dim_touched.withColumnRenamed(self.dim_key, self.join_col),
                self.join_col,
                "left_semi",
            ).select(self.fact_key)
            affected = via_dim if affected is None else affected.unionByName(via_dim)
        if affected is None:  # no changes at all
            return self.view
        affected = affected.distinct()

        recomputed = (
            self.fact.join(affected, self.fact_key, "left_semi")
            .join(
                self.dim.withColumnRenamed(self.dim_key, self.join_col),
                self.join_col,
            )
        )
        if self.view is None:
            self.view = recomputed
        else:
            kept = self.view.join(affected, self.fact_key, "left_anti")
            self.view = kept.unionByName(recomputed)
        # Truncate lineage per batch (components.py discipline): each
        # state references the previous batch's state — without this the
        # final plan re-executes every batch's merges multiplicatively
        # (measured 21 s -> 9 s at sf0.1 for 3 batches; eager materialization measured 11 s — lazy wins because states the next batch never touches are not forced). In a streaming
        # foreachBatch the sink write IS the truncation; localCheckpoint
        # is its batch-mode stand-in.
        self.fact = self.fact.localCheckpoint(eager=False)
        self.dim = self.dim.localCheckpoint(eager=False)
        self.view = self.view.localCheckpoint(eager=False)
        return self.view
