"""Streaming near-duplicate dedup (N2 on streams): incremental
MinHash-LSH against a persistent survivor index.

The batch pipeline (q116: ``minhash_lsh_pairs`` → connected components →
min-id drop list) assumes the whole corpus is visible at once. A
continuously-landing corpus (the CDC posture applied to documents) needs
the incremental form every production crawl dedup uses — new documents
are compared against what was already KEPT, never against the full
history of drops:

per micro-batch (``foreachBatch``):

1. **features** — ``(id, sig, hset)`` MinHash features for the batch
   (``operators.dedup.minhash_features``; computed once, persisted);
2. **index match** — LSH band join of the batch against the survivor
   index, exact-Jaccard verified; a match means the document duplicates
   an earlier survivor → dropped, attributed to the min-id keeper;
3. **within-batch** — the remainder runs the batch pair pipeline
   (``lsh_pairs_from_features`` → ``connected_components``), keeping the
   min-id representative per cluster — identical semantics to q116, so a
   single-batch stream IS the batch pipeline (parity-tested);
4. **append** the surviving features to the index under an overwritten
   ``batch=N`` subdir; the index read for batch N always EXCLUDES
   subdir N, so a replayed batch (checkpoint restart between writes)
   recomputes byte-identically — the same idempotence posture as
   ``Scd2Maintainer``.

Semantics vs the batch pipeline (documented, deliberate): keep-first is
greedy. A transitive chain a~b, b~c, a≁c that SPANS batches keeps {a, c}
(b dropped against a; c arrives later, matches only the dropped b, which
is not in the index) where the whole-corpus batch pipeline keeps {a}.
This is the standard streaming dedup contract (drops compare against
survivors only — comparing against dropped docs would make the index
grow with the corpus, not with the survivor set) and preserves the two
invariants that matter (property-tested in tests/test_neardup_stream.py):

- survivors are pairwise non-duplicate: no verified LSH pair exists
  between any two kept documents, within or across batches;
- every dropped document has a verified match (jaccard ≥ threshold) to
  its recorded keeper, and every keeper chain ends at a survivor.

Scale posture: the index carries one row per SURVIVING document —
``(id, sig, hset)``, no text — and the per-batch cost is one band-bucket
hash join of batch×index plus the batch-internal pipeline; both sides of
the band join are bucket-capped, so boilerplate floods stay O(cap²).
On a cluster, land the index bucketed by a band-value prefix so the
per-batch join prunes instead of shuffling the full index; with
``horizon_batches`` set, the match window slides (only the last N
batches' survivors are candidates) and index reads become
partition-pruned scans on the ``batch`` directory key — bounded state,
the ``dropDuplicatesWithinWatermark`` posture applied to near-dup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.components import connected_components
from snowflake_cdc_spark.operators.dedup import (
    _drop_oversized_buckets,
    jaccard,
    lsh_bands,
    lsh_pairs_from_features,
    minhash_features,
)

__all__ = ["NearDupMaintainer"]


class NearDupMaintainer:
    """Maintains a near-dup survivor index + drop log from doc batches."""

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 8,
        bands: int = 2,
        shingle_n: int = 3,
        threshold: float = 0.8,
        bucket_cap: int | None = 10_000,
        horizon_batches: int | None = None,
    ) -> None:
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.bucket_cap = bucket_cap
        self.horizon_batches = horizon_batches
        self.index_dir = os.path.join(root, "index")
        self.drops_dir = os.path.join(root, "drops")

    # ---------------------------------------------------------------- internals

    def _band_table(self, feats: DataFrame) -> DataFrame:
        rpb = self.k // self.bands
        t = feats.select(
            "id", F.explode(lsh_bands(F.col("sig"), self.bands, rpb)).alias("bv")
        ).select("id", "bv.band", "bv.band_val")
        if self.bucket_cap is not None:
            t = _drop_oversized_buckets(
                t, ["band", "band_val"], self.bucket_cap, "neardup_stream"
            )
        return t

    def _read_index(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        """Survivor features from every batch EXCEPT ``batch_id`` (replay
        safety), bounded to the sliding horizon when configured."""
        if not os.path.isdir(self.index_dir):
            return None
        idx = spark.read.parquet(self.index_dir)  # partition col: batch
        idx = idx.filter(F.col("batch") != batch_id)
        if self.horizon_batches is not None:
            idx = idx.filter(F.col("batch") > batch_id - self.horizon_batches)
        return idx.select("id", "sig", "hset")

    # ---------------------------------------------------------------- batch step

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        feats = minhash_features(
            batch, self.id_col, self.text_col, k=self.k, shingle_n=self.shingle_n
        ).persist()

        index = self._read_index(spark, batch_id)
        if index is not None:
            nb = self._band_table(feats)
            ib = self._band_table(index).withColumnRenamed("id", "keeper")
            cand = (
                nb.join(ib, ["band", "band_val"])
                .filter(F.col("id") != F.col("keeper"))
                .select("id", "keeper")
                .dropDuplicates(["id", "keeper"])
            )
            verified = (
                cand.join(feats.select("id", F.col("hset").alias("__hn")), "id")
                .join(
                    index.select(
                        F.col("id").alias("keeper"), F.col("hset").alias("__ho")
                    ),
                    "keeper",
                )
                .filter(jaccard(F.col("__hn"), F.col("__ho")) >= self.threshold)
            )
            index_drops = (
                verified.groupBy("id")
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
        pairs = lsh_pairs_from_features(
            remaining,
            k=self.k,
            bands=self.bands,
            threshold=self.threshold,
            round_to=None,
            bucket_cap=self.bucket_cap,
        )
        comp = connected_components(pairs, src="a", dst="b", algorithm="auto")
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
