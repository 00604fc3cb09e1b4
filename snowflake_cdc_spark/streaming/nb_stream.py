"""Streaming Naive Bayes classifier maintainer — the 8th maintainer on
the shared replay-safe state store: the q235 quality/domain filter
(operators/nb.py) trained INCREMENTALLY over a labeled document stream
instead of re-counting the corpus per model refresh.

State per word: ``(w, c1, c0)`` token counts per class, plus one
``__DOC__`` sentinel row carrying the per-class document counts. Every
statistic merges EXACTLY by SUM over the word key — after any number of
micro-batches, under any batch split, the state equals the one-shot
batch count, so parity is assertable as exact state equality (the
maintainer discipline), and the DERIVED model (llr/prior/unseen tables,
one libm ln per word at read time) is bit-identical to nb_train on the
union of everything seen.

Why the lns live in the READ, not the state: quantized log-odds don't
merge (ln(a+b) != f(ln a, ln b)); exact integer counts do. The model
read is vocabulary-sized work, paid only when a consumer refreshes.

Scale shape: per micro-batch ONE map-side-combined (word, class) count
of the batch + a vocab-sized merge join with the previous snapshot —
the VocabNoveltyMaintainer cost class. Scoring via operators/nb.py is
a vocab-keyed equi-join against the read-time model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.streaming.state_store import latest_snapshot

__all__ = ["NbClassifierMaintainer"]

_STATE_COLS = ["w", "c1", "c0"]
#: sentinel key holding (docs_pos, docs_neg) — cannot collide with real
#: words: the tokenizer lowercases and extracts letter runs only
_DOC_KEY = "__DOC__"


class NbClassifierMaintainer:
    """Maintains exact per-class word counts over a labeled doc stream;
    the NB model (llr/prior/unseen) is a view over the newest state."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        label_col: str = "pos",
        pattern: str = UNICODE_WORD,
    ) -> None:
        self.root = root
        self.text_col = text_col
        self.label_col = label_col
        self.pattern = pattern
        self.state_dir = os.path.join(root, "nb_classifier")

    # ------------------------------------------------------------- batch

    def _batch_summary(self, batch: DataFrame) -> DataFrame:
        pos = F.col(self.label_col)
        toks = batch.select(
            pos.alias("pos"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(self.text_col)), F.lit(self.pattern), F.lit(0)
                )
            ).alias("w"),
        )
        wc = toks.groupBy("w").agg(
            F.sum(F.col("pos").cast("bigint")).cast("bigint").alias("c1"),
            F.sum((~F.col("pos")).cast("bigint")).cast("bigint").alias("c0"),
        )
        docs = batch.agg(
            F.lit(_DOC_KEY).alias("w"),
            F.sum(pos.cast("bigint")).cast("bigint").alias("c1"),
            F.sum((~pos).cast("bigint")).cast("bigint").alias("c0"),
        )
        return wc.unionByName(docs)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        summ = self._batch_summary(batch)
        prev = latest_snapshot(spark, self.state_dir, batch_id, _STATE_COLS)
        merged = (
            summ
            if prev is None
            else summ.unionByName(prev)
            .groupBy("w")
            .agg(
                F.sum("c1").cast("bigint").alias("c1"),
                F.sum("c0").cast("bigint").alias("c0"),
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id}")
        )

    def run_stream(self, docs: DataFrame, checkpoint: str):
        """availableNow foreachBatch runner for a labeled doc feed."""
        return (
            docs.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # ------------------------------------------------------------- reads

    def state(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.state_dir):
            return spark.createDataFrame([], "w string, c1 bigint, c0 bigint")
        st = spark.read.parquet(self.state_dir)
        top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
        return st.filter(F.col("batch") == top).select(*_STATE_COLS)

    def model(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """(lr, k) exactly as ``operators/nb.py::nb_train`` derives them
        from the one-shot batch counts — same micro-nat quantization,
        same Laplace smoothing, so maintained-state models and batch
        models are interchangeable (test-pinned)."""
        from snowflake_cdc_spark.operators.nb import (
            _LLR_EXPR,
            _PRIOR_EXPR,
            _UNSEEN_EXPR,
            check_two_classes,
        )

        st = self.state(spark)
        wc = st.filter(F.col("w") != _DOC_KEY)
        cls = st.filter(F.col("w") == _DOC_KEY).select(
            F.col("c1").alias("d1"), F.col("c0").alias("d0")
        )
        row = cls.first()
        check_two_classes(
            (row["d1"] if row else 0) or 0, (row["d0"] if row else 0) or 0
        )
        nv = wc.agg(
            F.sum("c1").cast("bigint").alias("n1"),
            F.sum("c0").cast("bigint").alias("n0"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
        lr = wc.crossJoin(F.broadcast(nv)).select(
            "w", F.expr(_LLR_EXPR).alias("llr")
        )
        k = cls.crossJoin(F.broadcast(nv)).select(
            F.expr(_PRIOR_EXPR).alias("prior"),
            F.expr(_UNSEEN_EXPR).alias("unseen"),
        )
        return lr, k

    def score(self, docs: DataFrame) -> DataFrame:
        """Score (doc_id, ws, ...) docs against the maintained model
        (operators/nb.py::nb_score semantics)."""
        from snowflake_cdc_spark.operators.nb import nb_score

        lr, k = self.model(docs.sparkSession)
        return nb_score(docs, lr, k)
