"""Watermarked reorder pre-stage for the incremental maintainers
(VERDICT r05 #5, second half).

The maintainers (``SessionMaintainer`` / ``TransitionMaintainer`` /
``SetSimMaintainer``) document an ordering contract: batches arrive
event-time-ordered per user; late data belongs upstream in the
watermarked lanes. This module IS that upstream — the demonstrated
composition connecting the two halves:

1. the raw stream carries a watermark (``withWatermark(ts, delay)`` —
   the q45-q47 event-time lane);
2. events buffer in a windowed aggregation ``groupBy(window(ts, W),
   user) → sort_array(collect_list(struct(ts, seq, …)))`` — Spark's
   append-mode semantics emit a (window, user) group exactly ONCE, in
   the micro-batch where the watermark passes the window end;
3. ``foreachBatch`` explodes the finalized groups back into event rows
   and hands them to the maintainer's ``process_batch``.

Why this satisfies the maintainer contract: the watermark is monotone
across batches, and a window finalizes only once the watermark passes
its end — so for any user, every event delivered in batch N is
event-time-earlier than every event delivered in batch N+1 (two windows
finalizing in the SAME batch are handled by the maintainer's
within-batch (ts, seq) sort). A late event that arrives within the
watermark delay lands in its still-open window and is delivered IN
ORDER; an event older than the delay is dropped by the aggregation —
the standard watermark policy, now enforced in one place instead of
assumed by each maintainer.

The trade is latency, not correctness: the maintainer sees a window
only ``delay`` after it closes. That is the same trade the q47
session_window lane makes, applied in front of evidence-based state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowflake_cdc_spark.streaming.event_time import ensure_event_time

__all__ = ["watermarked_feed"]


def watermarked_feed(
    events: DataFrame,
    process_batch,
    checkpoint: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    payload_cols: tuple[str, ...] = (),
    delay: str = "90 minutes",
    window_size: str = "1 hour",
):
    """Start an availableNow stream that reorder-buffers ``events``
    behind a watermark and feeds finalized (window, user) groups to
    ``process_batch(batch_df, batch_id)`` — the maintainer seam, with
    the ordering contract enforced instead of assumed."""
    src = ensure_event_time(events, ts_col)
    ev = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(seq_col).alias("seq"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    agg = (
        src.withWatermark(ts_col, delay)
        .groupBy(
            F.window(F.col(ts_col), window_size).alias("__w"),
            F.col(user_col),
        )
        .agg(F.sort_array(F.collect_list(ev)).alias("__evs"))
    )

    def _feed(bdf: DataFrame, batch_id: int) -> None:
        rows = bdf.select(
            F.col(user_col), F.explode("__evs").alias("__e")
        ).select(
            F.col(user_col),
            F.col("__e.ts").alias(ts_col),
            F.col("__e.seq").alias(seq_col),
            *[F.col(f"__e.{c}").alias(c) for c in payload_cols],
        )
        process_batch(rows, batch_id)

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(_feed)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
