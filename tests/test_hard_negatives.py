"""Label-aware exact-IVF search (hard-negative mining mode of
operators/ivf_exact.py): the exclusion filter must precede the top-k
ranking, and plain mode must be unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.ivf_exact import ivf_exact_search
from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit, quantize_vectors


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )


class TestHardNegatives:
    def test_filter_precedes_ranking(self, spark):
        # anchor 1 (label 0) at ~origin; vec 2 (label 0) NEAREST; vecs
        # 3,4 (label 1) farther out. With k=1 the mined negative must
        # be vec 3 — a filter applied AFTER a k=1 ranking would rank
        # vec 2 first, trim it, and return nothing.
        rows = [
            (1, [0.00, 0.0], 0),
            (2, [0.01, 0.0], 0),
            (3, [0.10, 0.0], 1),
            (4, [0.20, 0.0], 1),
        ]
        emb = _emb(spark, rows)
        centroids, assigned = kmeans_fit(emb, k=1, rounds=1)
        assigned_l = assigned.join(emb.select("vec_id", "label"), "vec_id")
        queries = (
            quantize_vectors(emb.filter("vec_id = 1").select("vec_id", "embedding"))
            .join(emb.select("vec_id", "label"), "vec_id")
            .select(F.col("vec_id").alias("query_id"), "qv", "label")
        )
        got = ivf_exact_search(
            centroids, assigned_l, queries, k=1, nprobe=1, exclude_match_col="label"
        ).collect()
        assert [(r.query_id, r.vec_id) for r in got] == [(1, 3)]

    def test_all_same_label_yields_no_negatives(self, spark):
        rows = [(i, [0.01 * i, 0.0], 7) for i in range(1, 5)]
        emb = _emb(spark, rows)
        centroids, assigned = kmeans_fit(emb, k=1, rounds=1)
        assigned_l = assigned.join(emb.select("vec_id", "label"), "vec_id")
        queries = (
            quantize_vectors(emb.filter("vec_id = 1").select("vec_id", "embedding"))
            .join(emb.select("vec_id", "label"), "vec_id")
            .select(F.col("vec_id").alias("query_id"), "qv", "label")
        )
        assert (
            ivf_exact_search(
                centroids, assigned_l, queries, k=3, nprobe=1,
                exclude_match_col="label",
            ).count()
            == 0
        )

    def test_plain_mode_unchanged_by_new_param(self, spark):
        rows = [
            (1, [0.00, 0.0], 0),
            (2, [0.01, 0.0], 0),
            (3, [0.10, 0.0], 1),
        ]
        emb = _emb(spark, rows)
        centroids, assigned = kmeans_fit(emb, k=1, rounds=1)
        queries = quantize_vectors(
            emb.filter("vec_id = 1").select("vec_id", "embedding")
        ).select(F.col("vec_id").alias("query_id"), "qv")
        got = ivf_exact_search(centroids, assigned, queries, k=2, nprobe=1).collect()
        assert [(r.query_id, r.vec_id) for r in got] == [(1, 2), (1, 3)]
