"""Streaming Markov transition maintenance: the q181 transition matrix
kept incrementally over a continuously-landing event feed.

The batch lane (q181) re-scans all history per run; a pipeline
emitting next-action models or transition-anomaly screens wants the
incremental form — per micro-batch (``foreachBatch``):

1. **within-batch pairs** — per-user sorted struct arrays, consecutive
   type pairs via ``zip_with`` of shifted slices (the q181/q172 array
   posture, one data shuffle over the BATCH only);
2. **boundary pairs** — each user's last event from the persisted state
   joins the user's FIRST event of this batch: the transition that
   spans the batch seam, which a naive per-batch recount silently
   drops (the planted seam test pins it);
3. **delta write** — the batch's (prev_type, next_type, n) counts land
   under an overwritten ``batch=N`` subdir; totals are the sum over
   subdirs, so counts are mergeable and replay-safe (a checkpoint
   restart overwrites batch=N and reads exclude it — the
   ``SetSimMaintainer`` idempotence posture);
4. **state advance** — per-user (ts, event_id, type) of the newest
   event; the FULL compacted state lands under ``last/batch=N`` and
   reads take the newest remaining subdir, so state is one row per
   user regardless of history length.

Ordering contract (documented, asserted by the parity fuzz): batches
arrive event-time-ordered PER USER (append-only feed). Late data is an
upstream concern — route it through
``streaming/reorder.py::watermarked_feed`` (the demonstrated
watermark-buffered composition) before this maintainer.

Scale posture: per-batch work is one batch-sized shuffle + two joins
against per-user state (state is one row per user — bucket it by
user_id at 100 TB and the seam join co-locates); transition totals are
|types|^2 rows. Probabilities (exact ppm, the q181 formula) derive
from the summed counts at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["TransitionMaintainer"]


class TransitionMaintainer:
    """Maintains per-user last-event state + transition count deltas."""

    def __init__(
        self,
        root: str,
        user_col: str = "user_id",
        ts_col: str = "ts",
        seq_col: str = "event_id",
        type_col: str = "event_type",
    ) -> None:
        self.root = root
        self.user_col = user_col
        self.ts_col = ts_col
        self.seq_col = seq_col
        self.type_col = type_col
        self.state_dir = os.path.join(root, "last")
        self.delta_dir = os.path.join(root, "transitions")

    # ---------------------------------------------------------------- internals

    def _read_state(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        return latest_snapshot(
            spark,
            self.state_dir,
            batch_id,
            ["user", "last_ts", "last_seq", "last_type"],
        )

    # ---------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            F.col(self.user_col).alias("user"),
            F.col(self.ts_col).alias("ts"),
            F.col(self.seq_col).alias("seq"),
            F.col(self.type_col).alias("typ"),
        )
        per_user = (
            ev.groupBy("user")
            .agg(
                F.sort_array(F.collect_list(F.struct("ts", "seq", "typ"))).alias("s")
            )
            .withColumn("types", F.transform("s", lambda x: x["typ"]))
            .withColumn("n", F.size("types"))
            .persist()
        )
        per_user.count()

        within = per_user.select(
            F.explode(
                F.zip_with(
                    F.slice("types", 1, F.greatest(F.col("n") - 1, F.lit(0))),
                    F.slice("types", 2, F.greatest(F.col("n") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("nxt")),
                )
            ).alias("p")
        ).select("p.prev", "p.nxt")

        state = self._read_state(spark, batch_id)
        firsts = per_user.select(
            "user", F.element_at("types", 1).alias("first_type")
        )
        if state is not None:
            boundary = state.join(firsts, "user").select(
                F.col("last_type").alias("prev"),
                F.col("first_type").alias("nxt"),
            )
            pairs = within.unionByName(boundary)
        else:
            pairs = within

        deltas = pairs.groupBy("prev", "nxt").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        deltas.write.mode("overwrite").parquet(
            os.path.join(self.delta_dir, f"batch={batch_id}")
        )

        last = per_user.select(
            "user",
            F.element_at("s", F.col("n"))["ts"].alias("last_ts"),
            F.element_at("s", F.col("n"))["seq"].alias("last_seq"),
            F.element_at("s", F.col("n"))["typ"].alias("last_type"),
        )
        if state is not None:
            carried = state.join(last.select("user"), "user", "left_anti")
            new_state = carried.unionByName(last)
        else:
            new_state = last
        new_state.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        per_user.unpersist()

    # ---------------------------------------------------------------- public API

    def run_stream(self, events: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming event feed."""
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def transitions(self, spark: SparkSession) -> DataFrame:
        """Summed (prev_type, next_type, n_transitions, prob_ppm) across
        every processed batch — the q181 output shape."""
        d = spark.read.parquet(self.delta_dir)
        cnt = d.groupBy(
            F.col("prev").alias("prev_type"), F.col("nxt").alias("next_type")
        ).agg(F.sum("n").cast("bigint").alias("n_transitions"))
        tot = cnt.groupBy("prev_type").agg(
            F.sum("n_transitions").cast("bigint").alias("tot")
        )
        return cnt.join(F.broadcast(tot), "prev_type").select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.expr("CAST(n_transitions * 1000000 DIV tot AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
