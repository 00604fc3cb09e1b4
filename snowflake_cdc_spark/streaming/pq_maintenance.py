"""PQ index drift CLOSED LOOP (VERDICT r07 #7): the retrain-and-reindex
action behind ``operators/pq.py::CodebookDriftMonitor``.

The monitor observes (per-batch quantization error vs the frozen
training baseline); until this module, nothing acted on the
``rebuild_recommended`` flag — recall decayed until a human noticed.
``PqIndexMaintainer`` closes the loop inside the same foreachBatch turn:

1. every arriving batch is encoded against the CURRENT codebook
   generation with error tracking (one Arrow pass — the monitor's
   ``encode_observed``);
2. when the drift ratio trips, the maintainer retrains codebooks on the
   bounded md5 sample of the TRIGGERING batch (the drifted
   distribution, not the stale corpus), opens a new codebook
   GENERATION, and re-encodes ONLY the changed vectors — the arriving
   batch — against it (``encode_with``; prior generations keep their
   codes, which remain exactly as good as the day they were written
   because their codebooks are frozen WITH them);
3. the monitor re-baselines on the new generation's ``train_qerr`` so
   the next batch is judged against the distribution it actually
   belongs to.

Generations, not rebuilds: re-encoding a 100 TB codes table on every
drift trip is exactly the "rare scheduled job" posture the monitor's
docstring warns about. Versioned codebooks make the action O(batch):
each code row carries its generation implicitly (codes are stored per
generation), searches run the standard ADC per generation and merge on
the EXACT re-rank score — cosine after re-rank is codebook-independent,
so the cross-generation top-k merge is well-defined. The number of live
generations is bounded by drift events, not data; a compaction that
re-encodes old generations through the newest codebooks remains the
rare scheduled job, now triggered by generation COUNT instead of a
timer.

Deterministic end to end: md5 training sample, seeded k-means,
deterministic encode — the planted-shift test reproduces byte-identical
recalls on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.pq import (
    CodebookDriftMonitor,
    PqIndex,
    build_pq,
    encode_with,
    pq_search,
)
from snowflake_cdc_spark.operators.util import ckpt_eager

__all__ = ["PqIndexMaintainer"]


class PqIndexMaintainer:
    """foreachBatch maintainer that encodes arrivals, watches drift, and
    retrains into a new codebook generation when the monitor trips."""

    def __init__(
        self,
        index: PqIndex,
        threshold_ratio: float = 2.0,
        retrain_sample: int = 4096,
        seed: int = 42,
        max_iter: int = 20,
    ) -> None:
        if index.codes is None:
            raise ValueError("index must carry its codes (build_pq output)")
        self.versions: list[PqIndex] = [index]
        # per-generation codes tables; generation g's codes decode ONLY
        # against versions[g].codebooks
        self.codes: list[DataFrame] = [
            index.codes.transform(ckpt_eager)
        ]
        self.monitor = CodebookDriftMonitor(index, threshold_ratio)
        self.retrain_sample = retrain_sample
        self.seed = seed
        self.max_iter = max_iter
        # (batch_id, new_generation, train_qerr)
        self.rebuilds: list[tuple[int, int, float]] = []

    @property
    def current(self) -> PqIndex:
        return self.versions[-1]

    # ------------------------------------------------------------- batch

    def process_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        """Encode one arriving vector batch; retrain + re-encode it into
        a fresh generation when the drift monitor trips."""
        if batch_df.isEmpty():
            return
        metric = self.monitor.encode_observed(batch_df, batch_id)
        if metric.rebuild_recommended:
            cur = self.current
            new_index = build_pq(
                batch_df,
                id_col=cur.id_col,
                vec_col=cur.vec_col,
                m=cur.m,
                k=cur.k,
                seed=self.seed + len(self.versions),
                max_iter=self.max_iter,
                train_sample=self.retrain_sample,
            )
            # build_pq already ran encode_with(new_index, batch_df) —
            # the changed vectors ONLY; prior generations are untouched
            new_index.codes = new_index.codes.transform(ckpt_eager)
            self.versions.append(new_index)
            self.codes.append(new_index.codes)
            self.monitor = CodebookDriftMonitor(
                new_index, self.monitor.threshold_ratio
            )
            self.rebuilds.append(
                (batch_id, len(self.versions) - 1, new_index.extras["train_qerr"])
            )
        else:
            enc = encode_with(self.current, batch_df).transform(ckpt_eager)
            g = len(self.versions) - 1
            # a re-arriving id WITHIN the same generation would otherwise
            # leave two equal-__gen rows whose row_number tie in search()/
            # compact() breaks by partition layout — newest-wins must be
            # deterministic, so re-delivered ids are anti-joined out of
            # the accumulated codes before the union (the state-store
            # maintainers' merge discipline: one row per key, O(state))
            cur = self.current
            kept = self.codes[g].join(
                enc.select(cur.id_col), cur.id_col, "left_anti"
            )
            self.codes[g] = kept.unionByName(enc).transform(ckpt_eager)

    def run_stream(self, vectors: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a streaming vector feed."""
        return (
            vectors.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -------------------------------------------------------- compaction

    def compact(self) -> int:
        """The rare scheduled job: re-encode EVERY generation's vectors
        through the NEWEST codebooks and collapse to one generation.
        Trigger on generation COUNT (each live generation adds one ADC
        pass per search), not on a timer — drift events are what create
        generations, so the compaction budget tracks actual drift.
        Returns the number of generations collapsed. The raw vectors
        ride in each generation's codes table (``pq_search`` re-ranks
        on them), so compaction is one ``encode_with`` scan — no
        side-channel vector store needed."""
        if len(self.versions) == 1:
            return 1
        cur = self.current
        merged = None
        for g, (idx, codes) in enumerate(zip(self.versions, self.codes)):
            vecs = codes.select(
                idx.id_col, idx.vec_col, F.lit(g).alias("__gen")
            )
            merged = vecs if merged is None else merged.unionByName(vecs)
        # a re-arriving id leaves its stale row in the older generation;
        # keep only the NEWEST generation's vector per id so the
        # compacted table holds one row per id (the current value)
        w_id = Window.partitionBy(cur.id_col).orderBy(F.desc("__gen"))
        merged = (
            merged.withColumn("__rn", F.row_number().over(w_id))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__gen")
        )
        recoded = encode_with(cur, merged).transform(ckpt_eager)
        n = len(self.versions)
        self.versions = [cur]
        self.codes = [recoded]
        return n

    # ------------------------------------------------------------ search

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        shortlist: int = 50,
        query_id: str = "query_id",
        query_vec: str = "query_vec",
    ) -> DataFrame:
        """Cross-generation top-k: the standard ADC + exact re-rank per
        generation (each against its own codebooks and codes), merged on
        the exact cosine — generation-independent, so the union's top-k
        is exactly the top-k of the per-generation winners. A
        re-arriving (updated) id leaves its stale row in an older
        generation; the merge keeps only the NEWEST generation's hit
        per (query, id) before the final top-k, so an id never consumes
        two slots and the score reflects its current vector."""
        parts = []
        for g, (idx, codes) in enumerate(zip(self.versions, self.codes)):
            gen = PqIndex(
                codebooks=idx.codebooks,
                codes=codes,
                id_col=idx.id_col,
                vec_col=idx.vec_col,
                m=idx.m,
                k=idx.k,
                extras=idx.extras,
            )
            parts.append(
                pq_search(
                    gen,
                    queries,
                    k=k,
                    shortlist=shortlist,
                    query_id=query_id,
                    query_vec=query_vec,
                ).withColumn("__gen", F.lit(g))
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        id_col = self.current.id_col
        w_id = Window.partitionBy(query_id, id_col).orderBy(F.desc("__gen"))
        merged = (
            merged.withColumn("__gn", F.row_number().over(w_id))
            .filter(F.col("__gn") == 1)
            .drop("__gn", "__gen")
        )
        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(id_col))
        return (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
