"""IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2.8 N3 —
the second scale path besides LSH).

Classic IVF-Flat, Spark-native:

1. **build**: k-means over (a sample of) the corpus learns ``n_cells``
   centroids (pyspark.ml KMeans — distributed Lloyd iterations); every
   corpus vector is assigned to its nearest cell. The assignment column
   is the *inverted file*: partitioning/bucketing the corpus by cell id
   makes each probe a partition-pruned scan at warehouse scale.
2. **search**: each query scores the (tiny, broadcast) centroid table,
   keeps its ``nprobe`` nearest cells, joins the corpus on cell id —
   the cross product shrinks from |corpus|×|queries| to
   |corpus|×nprobe/n_cells×|queries| — then exact cosine + top-k.

Recall is tunable via nprobe (nprobe = n_cells ⇒ exact brute force).
Deterministic given the seed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.vectors import cosine_similarity


@dataclass
class IvfIndex:
    """The two tables an IVF index is: centroids (small) + assigned corpus."""

    centroids: DataFrame  # (cell_id int, centroid array<double>)
    corpus: DataFrame  # (<id_col>, <vec_col>, cell_id)
    id_col: str
    vec_col: str


def build_ivf(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
) -> IvfIndex:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.transform(vec_col, lambda x: x.cast("double"))).alias("__f"),
    )
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__f")
    model = km.fit(feats)
    assigned = model.transform(feats).select(
        id_col, vec_col, F.col(km.getPredictionCol()).alias("cell_id")
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"cell_id int, centroid array<double>",
    )
    return IvfIndex(centroids=centroids, corpus=assigned, id_col=id_col, vec_col=vec_col)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors probing each query's ``nprobe`` nearest
    cells. Output (query_id, <id_col>, sim)."""
    # 1. query → nprobe nearest cells (centroid table is tiny: broadcast)
    scored_cells = queries.crossJoin(F.broadcast(index.centroids)).select(
        query_id,
        query_vec,
        "cell_id",
        cosine_similarity(F.col(query_vec), F.col("centroid")).alias("__csim"),
    )
    w_cells = Window.partitionBy(query_id).orderBy(F.desc("__csim"), F.col("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(w_cells))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, query_vec, "cell_id")
    )
    # 2. candidates: corpus ∩ probed cells (the pruned scan), exact cosine
    cand = index.corpus.join(F.broadcast(probes), "cell_id")
    if exclude_self:
        cand = cand.filter(F.col(index.id_col) != F.col(query_id))
    scored = cand.select(
        query_id,
        index.id_col,
        F.round(
            cosine_similarity(F.col(index.vec_col), F.col(query_vec)), 4
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(index.id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
