"""Streaming quantile-sketch maintenance (VERDICT r06 #7): the q199
bottom-k-by-md5 rank sample (``operators/quantile_sketch.py``) kept
incrementally over a continuously-landing feed — the sixth maintainer
on the shared replay-safe state store (``streaming/state_store.py``).

Why this sketch streams exactly: the sample is a pure function of the
SET (the k rows with smallest md5(id)), and bottom-k of a union is the
bottom-k of the two bottom-k's — the proven KMV merge law
(fuzz-tested in test_quantile_sketch.py). So after any number of
micro-batches, under any batch split, the maintained ≤k-row state
EQUALS the batch ``bottomk_sample`` over all data seen; parity is
asserted as exact (h, v) set equality, not estimate closeness. Replay
safety is the store-level batch=N exclusion plus the merge law's
idempotence on (h, v) sets — a checkpoint-restart replay is absorbed
exactly.

Per micro-batch: the batch's own bottom-k (TakeOrderedAndProject —
per-partition summaries, no global sort), a ≤2k-row driver-tiny merge
with the previous snapshot, and an OPTIONAL per-batch estimate
emission: the requested quantile estimates from the merged sample
(array arithmetic over one ≤k-row aggregate) appended to an estimate
log, so a dashboard reads the quantile trajectory without touching
data. The DKW in-bound check (eps = 0.13 at k = 256) needs the true
rank interval — two conditional counts over the corpus — so it stays
a READ-side verification (:meth:`check` wires the maintained
estimates into ``rank_check``); the e2e test closes the loop against
everything that streamed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.quantile_sketch import (
    bottomk_sample,
    merge_samples,
    quantile_estimates,
    rank_check,
)
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["QuantileSketchMaintainer"]


class QuantileSketchMaintainer:
    """Maintains the global bottom-k rank sample; reads derive the q199
    estimate/check surfaces from the ≤k-row state."""

    def __init__(
        self,
        root: str,
        value_col: str,
        id_col: str,
        k: int = 256,
        q_ppms: list[int] | None = None,
    ) -> None:
        self.root = root
        self.value_col = value_col
        self.id_col = id_col
        self.k = k
        self.q_ppms = list(q_ppms or [250000, 500000, 750000, 900000])
        self.state_dir = os.path.join(root, "qsketch")
        self.est_dir = os.path.join(root, "qsketch_estimates")

    # ------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        summ = bottomk_sample(batch, self.value_col, self.id_col, k=self.k)
        prev = latest_snapshot(spark, self.state_dir, batch_id, ["h", "v"])
        merged = summ if prev is None else merge_samples(summ, prev, k=self.k)
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        # per-batch estimate emission: the quantile trajectory, one
        # ≤k-row aggregate per batch (overwrite => replay-safe)
        snap = spark.read.parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )
        quantile_estimates(snap, self.q_ppms).write.mode("overwrite").parquet(
            os.path.join(self.est_dir, f"batch={batch_id}")
        )

    # ------------------------------------------------------------- public API

    def run_stream(self, events: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming feed."""
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def sample(self, spark: SparkSession) -> DataFrame:
        """(h, v): the current maintained sample (newest batch); empty
        (typed) before the first batch lands."""
        if not os.path.isdir(self.state_dir):
            return spark.createDataFrame([], "h string, v bigint")
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return st.filter(F.col("batch") == top).select("h", "v")

    def estimates(self, spark: SparkSession) -> DataFrame:
        """(q_ppm, est) from the CURRENT maintained sample."""
        return quantile_estimates(self.sample(spark), self.q_ppms)

    def estimate_log(self, spark: SparkSession) -> DataFrame:
        """(batch, q_ppm, est): the per-batch quantile trajectory."""
        if not os.path.isdir(self.est_dir):
            return spark.createDataFrame(
                [], "batch int, q_ppm bigint, est bigint"
            )
        return spark.read.parquet(self.est_dir).select("batch", "q_ppm", "est")

    def check(
        self, df: DataFrame, eps_ppm: int = 130000
    ) -> DataFrame:
        """q199's DKW in-bound verification of the MAINTAINED estimates
        against a corpus: (q_ppm, est, r_lo, r_hi, n, within_bound)."""
        return rank_check(
            df, self.value_col, self.estimates(df.sparkSession), eps_ppm
        )
