"""Streaming unigram-tokenizer maintainer — the 9th maintainer on the
shared replay-safe state store: the q253 vocabulary kept continuously
trainable over a landing document stream instead of recomputed by
corpus scan.

State per word: ``(w, cnt)`` — the distinct-word frequency table the
whole unigram pipeline derives from. Counts merge EXACTLY by SUM under
any micro-batch split (the maintainer discipline), so after any number
of batches the state equals the one-shot batch aggregation and parity
is assertable as exact state equality. Piece counts, the costed
vocabulary, and the Viterbi segmentation are all DERIVED reads over the
newest state (operators/unigram.py — the same code the batch lanes
run), never part of state: retraining the tokenizer after a stream is
one ``vocab()`` call away, and a segmentation with the fresh vocab is
``segmented()``.

Scale shape: per micro-batch ONE map-side-combined word aggregation of
the batch + a vocab-sized merge join with the previous snapshot. State
size is the corpus's distinct-word vocabulary — the same boundedness
class as vocab_stream.py and the BPE word-frequency table. The derived
``vocab()`` read pays one piece expansion over the state (distinct
words, never occurrences) per call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators import unigram
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["UnigramVocabMaintainer"]

_STATE_COLS = ["w", "cnt"]


class UnigramVocabMaintainer:
    """Maintains the exact distinct-word frequency table over a document
    stream; tokenizer reads (vocab, segmentation) are derived views."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        pattern: str = "[a-z]+",
        max_wlen: int = unigram.MAX_WLEN,
        max_plen: int = unigram.MAX_PLEN,
        vocab_size: int = unigram.VOCAB_SIZE,
    ) -> None:
        self.root = root
        self.text_col = text_col
        self.pattern = pattern
        self.max_wlen = max_wlen
        self.max_plen = max_plen
        self.vocab_size = vocab_size
        self.state_dir = os.path.join(root, "unigram_vocab")

    # ------------------------------------------------------------- batch

    def _batch_summary(self, batch: DataFrame) -> DataFrame:
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
            .filter(F.length("w") <= self.max_wlen)
            .groupBy("w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        summ = self._batch_summary(batch)
        prev = latest_snapshot(spark, self.state_dir, batch_id, _STATE_COLS)
        merged = (
            summ
            if prev is None
            else summ.unionByName(prev)
            .groupBy("w")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
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
            return spark.createDataFrame([], "w string, cnt bigint")
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return st.filter(F.col("batch") == top).select(*_STATE_COLS)

    def vocab(self, spark: SparkSession) -> DataFrame:
        """(piece, cnt, cost): the costed vocabulary retrained from the
        maintained word counts — equal to the batch build over the same
        documents (the state IS the batch word table)."""
        wt = self.state(spark).select("w", F.col("cnt").alias("c"))
        return unigram.costed_vocab(
            spark, unigram.piece_counts(wt, self.max_plen), self.vocab_size
        )

    def segmented(self, spark: SparkSession) -> DataFrame:
        """(w, c, comp): the Viterbi segmentation of the maintained
        word table under the freshly retrained vocab."""
        wt = self.state(spark).select("w", F.col("cnt").alias("c"))
        return unigram.viterbi_segment(
            wt, self.vocab(spark), self.max_wlen, self.max_plen
        )
