"""Streaming vocabulary-novelty maintainer — the 7th maintainer on the
shared replay-safe state store: q224's shard-novelty curve kept
incrementally over a landing document stream instead of recomputed by
corpus scan.

State per word: ``(w, cnt, first_batch)``. Both statistics merge
EXACTLY (the maintainer discipline): counts by SUM, first_batch by MIN
over the word key — after any number of micro-batches, under any batch
split, the state equals the one-shot batch aggregation with batch
attribution, so parity is assertable as exact state equality.

Derived reads (never part of state):

- ``novelty_curve``: per batch, words first seen in that batch vs the
  total distinct vocabulary at that point — the diminishing-returns
  signal ("is more data still buying vocabulary?") available
  continuously instead of per audit run;
- ``vocab_size``: current distinct-word count, O(state).

Scale shape: per micro-batch ONE map-side-combined word aggregation of
the batch + a vocab-sized merge join with the previous snapshot. State
size is the corpus vocabulary — the same boundedness class as the BPE
word-frequency table (operators/bpe.py trains on it); for genuinely
unbounded keys (shingles, not words) compose the KMV maintainer
instead, exactly like field_stats.py's cardinality note.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["VocabNoveltyMaintainer"]

_STATE_COLS = ["w", "cnt", "first_batch"]


class VocabNoveltyMaintainer:
    """Maintains exact word -> (count, first-seen batch) over a
    document stream; novelty reads are views over the newest state."""

    def __init__(
        self, root: str, text_col: str = "text", pattern: str = UNICODE_WORD
    ) -> None:
        self.root = root
        self.text_col = text_col
        self.pattern = pattern
        self.state_dir = os.path.join(root, "vocab_novelty")

    # ------------------------------------------------------------- batch

    def _batch_summary(self, batch: DataFrame, batch_id: int) -> DataFrame:
        return (
            batch.select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower(F.col(self.text_col)),
                        F.lit(self.pattern),
                        F.lit(0),
                    )
                ).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .withColumn("first_batch", F.lit(batch_id).cast("bigint"))
        )

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        summ = self._batch_summary(batch, batch_id)
        prev = latest_snapshot(spark, self.state_dir, batch_id, _STATE_COLS)
        merged = (
            summ
            if prev is None
            else summ.unionByName(prev)
            .groupBy("w")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.min("first_batch").cast("bigint").alias("first_batch"),
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    def run_stream(self, docs: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming doc feed."""
        return (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # ------------------------------------------------------------- reads

    def state(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.state_dir):
            return spark.createDataFrame(
                [], "w string, cnt bigint, first_batch bigint"
            )
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return st.filter(F.col("batch") == top).select(*_STATE_COLS)

    def vocab_size(self, spark: SparkSession) -> int:
        return self.state(spark).count()

    def novelty_curve(self, spark: SparkSession) -> DataFrame:
        """(batch, n_new, vocab_after): words first seen per batch and
        the cumulative vocabulary — q224's curve from maintained state.
        The running sum's window orders the per-batch rollup (state
        collapses to one row per OBSERVED batch id — bounded by batch
        count, never by vocabulary)."""
        per_batch = (
            self.state(spark)
            .groupBy(F.col("first_batch").alias("batch"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
        )
        w = Window.orderBy("batch").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return per_batch.withColumn(
            "vocab_after", F.sum("n_new").over(w).cast("bigint")
        ).orderBy("batch")
