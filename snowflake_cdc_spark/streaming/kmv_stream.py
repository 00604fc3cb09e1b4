"""Streaming distinct-count maintenance: the q135 KMV sketch kept
incrementally per group over a continuously-landing feed — the fourth
maintainer on the shared replay-safe state store
(``streaming/state_store.py``), and the one whose state is a SKETCH
rather than raw rows: per group, the k lexicographically-smallest
distinct md5 hashes (≤ k rows per group forever, however long the
stream runs).

Exactness of the incremental form (the KMV merge law, same as
``operators/quantile_sketch.py``): bottom-k of a union is the bottom-k
of the two bottom-k's, so after any number of batches the maintained
sketch EQUALS the batch ``kmv_sketch`` over all data seen — parity is
asserted as set equality of the sketches, not just closeness of the
estimates. Because merging is idempotent on (group, h) sets, a replayed
batch is absorbed exactly (plus the store-level batch=N exclusion).

Per micro-batch: one distinct over (group, md5) — the shuffle carries
32-byte hashes, never payloads — a union with the ≤k-per-group state,
and a per-GROUP bounded window (≤ k + batch-distinct rows per
partition). Estimates derive at read time via the q135 formula
((k-1)/u_k on the exact 52-bit dyadic u_k, exact count below k).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.sketches import kmv_estimate
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["DistinctCountMaintainer"]


class DistinctCountMaintainer:
    """Maintains per-group KMV sketches; ``estimates`` = q135 output."""

    def __init__(
        self,
        root: str,
        key_col: str = "user_id",
        group_col: str = "event_type",
        k: int = 32,
    ) -> None:
        self.root = root
        self.key_col = key_col
        self.group_col = group_col
        self.k = k
        self.state_dir = os.path.join(root, "sketch")

    # ---------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        hashed = batch.select(
            F.col(self.group_col).alias("grp"),
            F.md5(F.col(self.key_col).cast("string")).alias("h"),
        ).distinct()
        prev = latest_snapshot(spark, self.state_dir, batch_id, ["grp", "h"])
        merged = (
            hashed
            if prev is None
            else hashed.unionByName(prev).dropDuplicates(["grp", "h"])
        )
        w = Window.partitionBy("grp").orderBy("h")
        topk = (
            merged.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= self.k)
            .select("grp", "h")
        )
        topk.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    # ---------------------------------------------------------------- public API

    def run_stream(self, events: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming event feed."""
        return (
            events.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def sketch(self, spark: SparkSession) -> DataFrame:
        """(grp, h, rk): the current maintained sketch (newest batch);
        empty (typed) before the first batch lands — the session_stream
        read-time guard, so callers need no existence check."""
        if not os.path.isdir(self.state_dir):
            return spark.createDataFrame([], "grp string, h string, rk int")
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        w = Window.partitionBy("grp").orderBy("h")
        return (
            st.filter(F.col("batch") == top)
            .select("grp", "h")
            .withColumn("rk", F.row_number().over(w))
        )

    def estimates(self, spark: SparkSession) -> DataFrame:
        """(grp, kmv_est) — the q135 estimate over the maintained state."""
        return kmv_estimate(self.sketch(spark), "grp", k=self.k)
