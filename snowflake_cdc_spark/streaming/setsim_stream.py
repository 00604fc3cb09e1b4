"""Streaming exact set-similarity dedup (the recall-1.0 lane on
streams): incremental Jaccard join against a persistent survivor
posting index.

``operators/setsim.py`` computes ALL pairs with Jaccard >= t over a
corpus visible at once. A continuously-landing corpus needs the
incremental form (the posture ``neardup_stream.py`` gives MinHash,
applied to the EXACT lane — no LSH false negatives, for legal-hold /
contamination workloads where recall must be 1.0):

per micro-batch (``foreachBatch``):

1. **shingle** — the batch's distinct word n-gram shingle sets
   (``operators.setsim.shingle_sets``), denormalized with set sizes;
2. **index match** — inverted-index join of the batch's postings
   against the SURVIVOR index postings only (never against dropped
   documents' postings — the index grows with survivors, not the
   corpus), per-(doc, keeper) intersection counts, integer-threshold
   verify ``den*inter >= num*union`` (exact: no hash, no banding, so a
   batch doc duplicating ANY survivor is caught with certainty);
3. **within-batch** — the remainder runs the exact batch pair join
   (``allpairs_jaccard_join``) → connected components → min-id keeper
   per cluster, identical semantics to the batch lane, so a
   single-batch stream IS the batch pipeline (parity-tested);
4. **append** the survivors' postings under an overwritten ``batch=N``
   subdir; index reads EXCLUDE subdir N, so a replayed batch
   (checkpoint restart between writes) recomputes byte-identically —
   the ``NearDupMaintainer`` / ``Scd2Maintainer`` idempotence posture.

Invariants (property-tested in ``tests/test_setsim_stream.py``):

- survivors are pairwise DISSIMILAR — for no two kept documents does
  Jaccard >= t hold, within or across batches (exactness makes this a
  hard guarantee, not an LSH-probability one);
- every drop's keeper is a survivor; index drops have a DIRECT
  verified Jaccard >= t to their keeper, batch drops are connected to
  theirs by a chain of verified pairs (the component they share — the
  q149 batch contract).

Greedy keep-first is inherited: a transitive chain spanning batches can
keep both endpoints (same documented contract as neardup_stream.py).

Scale posture: per-batch cost is one hash join of batch-postings ×
survivor-postings on the shingle token — at 100 TB land the index
bucketed by ``tok`` so the join co-locates without reshuffling history,
and the per-token candidate volume is Σ df_batch(tok)·df_index(tok),
self-limited because boilerplate-heavy docs were already deduplicated
out of the index. ``horizon_batches`` bounds state to a sliding window
of recent survivors (partition-pruned reads on the ``batch`` key).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.streaming.state_store import delta_batches
from snowflake_cdc_spark.operators.setsim import (
    allpairs_jaccard_join,
    shingle_sets,
)

__all__ = ["SetSimMaintainer"]


class SetSimMaintainer:
    """Maintains an exact-Jaccard survivor posting index + drop log."""

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_n: int = 3,
        threshold_num: int = 6,
        threshold_den: int = 10,
        horizon_batches: int | None = None,
    ) -> None:
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.tn = threshold_num
        self.td = threshold_den
        self.horizon_batches = horizon_batches
        self.index_dir = os.path.join(root, "index")
        self.drops_dir = os.path.join(root, "drops")

    # ---------------------------------------------------------------- internals

    def _features(self, batch: DataFrame) -> DataFrame:
        """(id, tok, sz): distinct shingle postings with the set size
        denormalized onto every row (saves the per-batch re-aggregation
        at read time)."""
        toks = shingle_sets(
            batch, n=self.shingle_n, id_col=self.id_col, text_col=self.text_col
        ).select(F.col(self.id_col).alias("id"), "tok")
        from pyspark.sql import Window

        return toks.withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("id")).cast("bigint")
        )

    def _read_index(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        return delta_batches(
            spark,
            self.index_dir,
            batch_id,
            ["id", "tok", "sz"],
            horizon_batches=self.horizon_batches,
        )

    # ---------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        feats = self._features(batch).persist()

        index = self._read_index(spark, batch_id)
        if index is not None:
            inter = (
                feats.join(
                    index.select(
                        F.col("id").alias("keeper"),
                        "tok",
                        F.col("sz").alias("ksz"),
                    ),
                    "tok",
                )
                .groupBy("id", "keeper")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_inter"),
                    F.first("sz").alias("sa"),
                    F.first("ksz").alias("sb"),
                )
            )
            index_drops = (
                inter.filter(
                    self.td * F.col("n_inter")
                    >= self.tn * (F.col("sa") + F.col("sb") - F.col("n_inter"))
                )
                .groupBy("id")
                .agg(F.min("keeper").alias("keeper"))
                .withColumn("via", F.lit("index"))
                .persist()
            )
        else:
            index_drops = (
                feats.select("id", F.col("id").alias("keeper"))
                .limit(0)
                .withColumn("via", F.lit("index"))
            )

        remaining = feats.join(index_drops.select("id"), "id", "left_anti").persist()
        pairs = allpairs_jaccard_join(
            remaining.select(F.col("id").alias(self.id_col), "tok"),
            threshold_num=self.tn,
            threshold_den=self.td,
            id_col=self.id_col,
        )
        comp = connected_components(
            pairs, src="doc_a", dst="doc_b", algorithm="auto"
        )
        batch_drops = (
            comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias("id"), F.col("component").alias("keeper"))
            .withColumn("via", F.lit("batch"))
        )

        drops = index_drops.unionByName(batch_drops)
        drops.write.mode("overwrite").parquet(
            os.path.join(self.drops_dir, f"batch={batch_id}")
        )
        kept = remaining.join(
            spark.read.parquet(os.path.join(self.drops_dir, f"batch={batch_id}"))
            .filter(F.col("via") == "batch")
            .select("id"),
            "id",
            "left_anti",
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, f"batch={batch_id}")
        )
        feats.unpersist()
        remaining.unpersist()

    # ---------------------------------------------------------------- public API

    def run_stream(self, docs: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming document feed."""
        return (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def drops(self, spark: SparkSession) -> DataFrame:
        """(id, keeper, via, batch) — every document dropped so far."""
        return spark.read.parquet(self.drops_dir)

    def survivors(self, docs: DataFrame) -> DataFrame:
        """Filter a document table to the rows that survived dedup."""
        spark = docs.sparkSession
        if not os.path.isdir(self.drops_dir):
            return docs
        return docs.join(
            self.drops(spark).select(F.col("id").alias(self.id_col)),
            self.id_col,
            "left_anti",
        )
