"""Streaming gap-based sessionization: the q99 batch semantics kept
incrementally with open-session state — the canonical stateful
streaming operator, in the maintainer posture of
``markov_stream.py`` / ``setsim_stream.py``.

Per micro-batch (``foreachBatch``):

1. **within-batch split** — per user, events sort by (ts, seq); a new
   session starts where the gap from the previous event exceeds
   ``gap_seconds`` (one batch-sized shuffle, lag + running-sum ids —
   exactly q99's algorithm on the batch slice);
2. **seam merge** — each user's OPEN session from state joins the
   user's first within-batch session: if the first batch event falls
   within the gap of the open session's last event, that session
   EXTENDS (start/n_events carry over); otherwise the open session
   CLOSES and lands in this batch's closed output — the decision a
   per-batch recount cannot make (planted seam tests pin both
   branches);
3. **closed write** — sessions superseded by later activity land under
   an overwritten ``closed/batch=N`` subdir (mergeable, replay-safe:
   reads exclude the batch being reprocessed — the SetSimMaintainer
   idempotence posture);
4. **state advance** — per user at most ONE open session (the latest);
   users silent this batch carry forward unchanged. A session only
   closes on EVIDENCE (a later event beyond the gap) — time-based
   flushing belongs to the watermarked ``session_window`` lane (q47);
   for end-of-feed semantics read ``sessions(include_open=True)``,
   which unions the open remainder.

Ordering contract (as markov_stream): batches arrive event-time-ordered
per user; late data routes through the watermarked lanes upstream —
CONCRETELY ``streaming/reorder.py::watermarked_feed``, the demonstrated
composition (test_reorder_feed.py: a planted late event crosses a batch
boundary and the watermark reorders it before the seam decision).

Scale posture: per-batch work is one batch-keyed shuffle plus a join
against one-open-session-per-user state (bucket state by user at
100 TB); closed-session output is append-only and never re-read by the
maintainer itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["SessionMaintainer"]


def _sec(col):
    return F.unix_timestamp(col.cast("timestamp"))


class SessionMaintainer:
    """Maintains per-user open sessions + closed-session log."""

    def __init__(
        self,
        root: str,
        gap_seconds: int = 28800,
        user_col: str = "user_id",
        ts_col: str = "ts",
        seq_col: str = "event_id",
    ) -> None:
        self.root = root
        self.gap = gap_seconds
        self.user_col = user_col
        self.ts_col = ts_col
        self.seq_col = seq_col
        self.state_dir = os.path.join(root, "open")
        self.closed_dir = os.path.join(root, "closed")

    # ---------------------------------------------------------------- internals

    def _read_state(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        return latest_snapshot(
            spark, self.state_dir, batch_id, ["user", "o_start", "o_last", "o_n"]
        )

    # ---------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            F.col(self.user_col).alias("user"),
            _sec(F.col(self.ts_col)).alias("t"),
            F.col(self.seq_col).alias("seq"),
        )
        w = Window.partitionBy("user").orderBy("t", "seq")
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lag_t = F.lag("t").over(w)
        numbered = ev.withColumn(
            "sid",
            F.sum(
                F.when(lag_t.isNull() | ((F.col("t") - lag_t) > self.gap), 1)
                .otherwise(0)
            ).over(wrun),
        )
        sess = (
            numbered.groupBy("user", "sid")
            .agg(
                F.min("t").alias("s_start"),
                F.max("t").alias("s_last"),
                F.count(F.lit(1)).cast("bigint").alias("s_n"),
            )
            .persist()
        )
        sess.count()

        last_sid = sess.groupBy("user").agg(F.max("sid").alias("max_sid"))
        state = self._read_state(spark, batch_id)
        if state is None:
            state = (
                sess.select("user")
                .limit(0)
                .withColumn("o_start", F.lit(None).cast("long"))
                .withColumn("o_last", F.lit(None).cast("long"))
                .withColumn("o_n", F.lit(None).cast("long"))
            )

        first = sess.filter(F.col("sid") == 1).join(state, "user", "left")
        extends = F.col("o_last").isNotNull() & (
            (F.col("s_start") - F.col("o_last")) <= self.gap
        )
        # the open session closes NOW iff the user has batch activity
        # beyond its gap; it stays open (carried) only when extended
        closed_state = first.filter(
            F.col("o_last").isNotNull() & ~extends
        ).select(
            "user",
            F.col("o_start").alias("start_t"),
            F.col("o_last").alias("last_t"),
            F.col("o_n").alias("n_events"),
        )
        # session 1 merged bounds (used whether it closes or stays open)
        merged_first = first.select(
            "user",
            F.lit(1).alias("sid"),
            F.when(extends, F.col("o_start")).otherwise(F.col("s_start")).alias(
                "s_start"
            ),
            F.col("s_last"),
            (F.col("s_n") + F.when(extends, F.col("o_n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("s_n"),
        )
        merged = sess.filter(F.col("sid") != 1).unionByName(merged_first)

        closed_batch = (
            merged.join(last_sid, "user")
            .filter(F.col("sid") != F.col("max_sid"))
            .select(
                "user",
                F.col("s_start").alias("start_t"),
                F.col("s_last").alias("last_t"),
                F.col("s_n").alias("n_events"),
            )
        )
        closed_state.unionByName(closed_batch).write.mode("overwrite").parquet(
            os.path.join(self.closed_dir, f"batch={batch_id}")
        )

        open_now = (
            merged.join(last_sid, "user")
            .filter(F.col("sid") == F.col("max_sid"))
            .select(
                "user",
                F.col("s_start").alias("o_start"),
                F.col("s_last").alias("o_last"),
                F.col("s_n").alias("o_n"),
            )
        )
        carried = state.join(open_now.select("user"), "user", "left_anti")
        carried.unionByName(open_now).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        sess.unpersist()

    # ---------------------------------------------------------------- public API

    def run_stream(self, events: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming event feed."""
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def sessions(self, spark: SparkSession, include_open: bool = True) -> DataFrame:
        """(user, start_t, last_t, n_events, open) — closed sessions
        from every batch, plus the current open sessions."""
        closed = (
            spark.read.parquet(self.closed_dir)
            .select("user", "start_t", "last_t", "n_events")
            .withColumn("open", F.lit(False))
            if os.path.isdir(self.closed_dir)
            else None
        )
        out = closed
        if include_open and os.path.isdir(self.state_dir):
            st = spark.read.parquet(self.state_dir)
            top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
            opens = st.filter(F.col("batch") == top).select(
                "user",
                F.col("o_start").alias("start_t"),
                F.col("o_last").alias("last_t"),
                F.col("o_n").alias("n_events"),
            ).withColumn("open", F.lit(True))
            out = opens if out is None else out.unionByName(opens)
        return out
