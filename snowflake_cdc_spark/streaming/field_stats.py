"""Continuously-maintained per-field statistics — the reference
engine's always-on inspection service (first/last-seen
add_output.py:264-274, value distributions add_output.py:524-525)
kept incrementally over a landing stream, instead of the on-demand
A1/A2 scans in ``operators/stats.py`` (VERDICT r06 #3: the last
reference-parity gap now that the maintainer infrastructure exists).

Fifth maintainer on the shared replay-safe state store
(``streaming/state_store.py``). State per (field, value):

    (field, val, cnt, first_seen, last_seen)

All three statistics merge EXACTLY (the KMV-style discipline — no
approximate compactors in state): counts by SUM, first_seen by MIN,
last_seen by MAX, each over the (field, val) key. So after any number
of micro-batches, under any batch split, the maintained state EQUALS
the one-shot batch aggregation over all data seen — parity is asserted
as exact state equality, fuzzed over arbitrary splits. Replay safety
is the store-level batch=N exclusion: a checkpoint-restart replay of
batch N never reads batch N's own partial output, and re-merging the
same batch produces the identical snapshot.

Derived reads (never part of state, so no merge-law compromise):

- per-field first/last-seen = min/max over the field's value rows —
  the A2 surface, now O(1) instead of a corpus scan;
- top-N value distribution = per-FIELD bounded window over the state
  (the A1 surface; the window partitions by field, never the data);
- ``backfill_start_ts`` feeds the maintained first-seen scalars into
  ``operators/stats.py::backfill_start`` — the E3 backfill-start path
  (add_output.py:201-203) reading the always-on service rather than
  rescanning the corpus.

Scale shape: per micro-batch ONE map-side-combined aggregation of the
batch to (field, val) granularity, one merge-join with the previous
snapshot on the same key. State size is Σ per-field distinct values —
exact by design for the inspection fields this serves (types, sources,
status codes); for unbounded-cardinality fields compose the KMV
maintainer (``kmv_stream.py``) or the count-min sketch (q134) instead
of pointing this one at them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.stats import backfill_start
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["FieldStatsMaintainer", "field_stats_report"]

_STATE_COLS = ["field", "val", "cnt", "first_seen", "last_seen"]


def field_stats_report(
    df: DataFrame, fields: list[str], ts_col: str = "ts"
) -> DataFrame:
    """(field, val, cnt, first_seen, last_seen) — the one-shot batch
    form of the maintained state (and the maintainer's per-batch
    summary): one stack + one map-side-combined aggregation. Dotted
    names are nested-struct paths; NULL values are absent by the
    first/last-seen contract (a field "holds data" when non-null)."""
    n = len(fields)
    pairs = ", ".join(
        f"'{f}', CAST({f if '.' in f else '`' + f + '`'} AS STRING)"
        for f in fields
    )
    stacked = df.select(
        F.expr(f"stack({n}, {pairs})").alias("field", "val"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("val").isNotNull())
    return stacked.groupBy("field", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min("__ts").alias("first_seen"),
        F.max("__ts").alias("last_seen"),
    )


class FieldStatsMaintainer:
    """Maintains exact (field, value) -> (count, first_seen, last_seen)
    over a stream; every read is a view over the newest snapshot."""

    def __init__(
        self,
        root: str,
        fields: list[str],
        ts_col: str = "ts",
    ) -> None:
        self.root = root
        self.fields = list(fields)
        self.ts_col = ts_col
        self.state_dir = os.path.join(root, "field_stats")

    # ------------------------------------------------------------- batch step

    def _batch_summary(self, batch: DataFrame) -> DataFrame:
        """(field, val, cnt, first_seen, last_seen) at batch granularity
        — the shared one-shot report over just this batch."""
        return field_stats_report(batch, self.fields, self.ts_col)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        summ = self._batch_summary(batch)
        prev = latest_snapshot(spark, self.state_dir, batch_id, _STATE_COLS)
        merged = (
            summ
            if prev is None
            else summ.unionByName(prev)
            .groupBy("field", "val")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.min("first_seen").alias("first_seen"),
                F.max("last_seen").alias("last_seen"),
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    # ------------------------------------------------------------- public API

    def run_stream(self, events: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming event feed."""
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def state(self, spark: SparkSession) -> DataFrame:
        """(field, val, cnt, first_seen, last_seen): newest snapshot;
        empty (typed) before the first batch lands."""
        if not os.path.isdir(self.state_dir):
            return spark.createDataFrame(
                [],
                "field string, val string, cnt bigint, "
                "first_seen timestamp, last_seen timestamp",
            )
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return st.filter(F.col("batch") == top).select(*_STATE_COLS)

    def field_summary(self, spark: SparkSession) -> DataFrame:
        """(field, first_seen, last_seen, n_values, n_rows) — the A2
        first/last-seen surface from maintained state, O(state) not
        O(corpus)."""
        return (
            self.state(spark)
            .groupBy("field")
            .agg(
                F.min("first_seen").alias("first_seen"),
                F.max("last_seen").alias("last_seen"),
                F.count(F.lit(1)).cast("bigint").alias("n_values"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
            )
        )

    def top_values(self, spark: SparkSession, n: int = 10) -> DataFrame:
        """(field, val, cnt, rk): the A1 value-distribution surface —
        per-FIELD window (bounded by field count, never the data)."""
        w = Window.partitionBy("field").orderBy(
            F.desc("cnt"), F.col("val")
        )
        return (
            self.state(spark)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= n)
            .select("field", "val", "cnt", "rk")
        )

    def backfill_start_ts(
        self,
        spark: SparkSession,
        fields: list[str] | None = None,
        pad_minutes: int = 1,
    ):
        """E3 wire: earliest maintained first-seen across ``fields``
        minus the skew pad — ``operators/stats.py::backfill_start``
        fed from the always-on state instead of a corpus rescan."""
        summ = self.field_summary(spark)
        if fields is not None:
            summ = summ.filter(F.col("field").isin(fields))
        vals = [r.first_seen for r in summ.select("first_seen").collect()]
        return backfill_start(vals, pad_minutes=pad_minutes)
