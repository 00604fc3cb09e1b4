"""IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2.8 N3 —
the second scale path besides LSH).

Classic IVF-Flat, Spark-native:

1. **build**: k-means over a bounded *sample* of the corpus learns
   ``n_cells`` centroids. Training runs driver-side in numpy (seeded
   k-means++ init + Lloyd) — the FAISS posture: at 100 TB you never run
   distributed Lloyd over the full corpus, you train on ~100k sampled
   vectors (milliseconds of linear algebra) and spend the cluster time
   on the single distributed pass that matters, assigning every corpus
   vector to its nearest centroid (vectorized pandas_udf, one numpy
   matmul per Arrow batch). The assignment column is the *inverted
   file*: partitioning/bucketing the corpus by cell id makes each probe
   a partition-pruned scan at warehouse scale. (A pyspark.ml KMeans
   path is kept behind ``use_ml=True`` for comparison; its 20 scheduled
   jobs cost ~10 s of overhead before any data is touched.)
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

from snowflake_cdc_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


@dataclass
class IvfIndex:
    """The two tables an IVF index is: centroids (small) + assigned corpus."""

    centroids: DataFrame  # (cell_id int, centroid array<double>)
    corpus: DataFrame  # (<id_col>, <vec_col>, cell_id)
    id_col: str
    vec_col: str


def bounded_md5_sample(df: DataFrame, id_col: str, cols: list[str], n: int) -> list:
    """Deterministic bounded training sample (md5-keyed, layout-invariant)
    WITHOUT a global sort and WITHOUT a sizing count() pre-pass: filter to
    a fixed 1/16 hash slice (md5 first hex char == '0' — a pure scan
    predicate), then TakeOrdered only the surviving sliver. Taking the n
    smallest md5 keys of the slice equals the global
    ``orderBy(md5).limit(n)`` whenever the slice holds >= n rows — true
    for any corpus >= ~16×n with overwhelming margin (binomial
    concentration). Only corpora small enough to fail that test pay a
    second (cheap, because small) full TakeOrdered pass; big corpora are
    sampled in a single scan. Shared by IVF and PQ training."""
    key = F.md5(F.col(id_col).cast("string"))
    src = df.select(*cols)
    rows = src.filter(F.substring(key, 1, 1) == F.lit("0")).orderBy(key).limit(n).collect()
    if len(rows) < n:
        # small corpus (or pathological hash skew): Spark-side md5 order
        # over the full corpus — same expression as the slice path, so
        # ordering is consistent for every id type (int/string/decimal/ts)
        rows = src.orderBy(key).limit(n).collect()
    return rows


def _train_centroids(X, n_cells: int, seed: int, max_iter: int):
    """Seeded k-means++ init + Lloyd over an in-memory sample (numpy)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = X.shape[0]
    # k-means++ seeding, incremental: keep the running min-distance² and
    # fold in ONLY the newest center each step — O(k·n·d) total, not the
    # O(k²·n·d) of recomputing the full center-distance matrix per step
    # (at k=256 codewords for PQ that difference is ~100× wall clock).
    centers = [X[rng.randint(n)]]
    d2 = ((X - centers[0]) ** 2).sum(1)
    for _ in range(1, n_cells):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(X[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(1))
    C = np.array(centers)
    # Preallocated distance buffer + in-place ops (round 12): the
    # per-iteration ``-2 * X @ C.T + c²`` built three n×k temporaries;
    # at k=256 codewords × 8 subspaces × ~15 iterations the allocations
    # dominated build_pq's driver time. Same elementwise operations in
    # the same order — bit-identical assignments and centroids.
    D = np.empty((n, n_cells), dtype=X.dtype)
    for _ in range(max_iter):
        # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin drops the ||x||² term
        np.dot(X, C.T, out=D)
        D *= -2
        D += (C * C).sum(1)[None, :]
        assign = D.argmin(1)
        newC = C.copy()
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(0)
        if np.allclose(newC, C):
            break
        C = newC
    return C


def build_ivf(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    train_sample: int = 100_000,
    use_ml: bool = False,
    sample_rows: list | None = None,
) -> IvfIndex:
    """``sample_rows``: a pre-collected ``bounded_md5_sample`` result —
    lets a caller training several indexes over the same corpus (see
    ``build_ivfpq``) pay the sample scan once."""
    from snowflake_cdc_spark.operators.util import fan_out

    # Fan out the corpus BEFORE the assignment UDF (round 12): a corpus
    # that fits one parquet split otherwise threads the encode UDF, the
    # ANN pair scans and every recall check through ONE task (event-log
    # profile: 4.8 s max task on q52/q133/q144 — the same parallelism
    # collapse fixed in relational_kmeans_fit in round 11). No-op once
    # the corpus spans enough files/partitions.
    corpus = fan_out(corpus)
    spark = corpus.sparkSession
    if use_ml:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            array_to_vector(
                F.transform(vec_col, lambda x: x.cast("double"))
            ).alias("__f"),
        )
        km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__f")
        model = km.fit(feats)
        assigned = model.transform(feats).select(
            id_col, vec_col, F.col(km.getPredictionCol()).alias("cell_id")
        )
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
    else:
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import IntegerType

        rows = (
            sample_rows
            if sample_rows is not None
            else bounded_md5_sample(corpus, id_col, [id_col, vec_col], train_sample)
        )
        X = np.array([r[1] for r in rows], dtype=np.float64)
        C = _train_centroids(X, n_cells, seed, max_iter)
        c_sq = (C * C).sum(1)

        def _assign(col):
            m = np.vstack(col.to_numpy()).astype(np.float64)
            return pd.Series((-2 * m @ C.T + c_sq[None, :]).argmin(1))

        assign_udf = F.pandas_udf(_assign, IntegerType())
        assigned = corpus.select(
            id_col, vec_col, assign_udf(F.col(vec_col)).alias("cell_id")
        )
        centers = [[float(x) for x in c] for c in C]

    centroids = spark.createDataFrame(
        list(enumerate(centers)), "cell_id int, centroid array<double>"
    )
    return IvfIndex(centroids=centroids, corpus=assigned, id_col=id_col, vec_col=vec_col)


def ivf_recall_check(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 12,
    min_recall: float = 0.9,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """One-row (n_queries, recall_ok): recall@k of the nprobe-pruned ANN
    search against the exhaustive top-k, in a SINGLE corpus×queries pass.

    The naive form runs ``ivf_search`` twice (nprobe and full-probe) and
    joins — two scoring passes and two sorts over |corpus|×|queries|
    rows. Here every candidate is scored once and flagged ``in_probe``
    (its cell is among the query's nprobe nearest); ONE window sort then
    yields both ranks: ``row_number`` = exhaustive rank, and a running
    sum of the flag = the candidate's rank *within the probed subset*,
    which is exactly the rank ``ivf_search`` would assign (same
    (sim desc, id) order, same rounding, same self-exclusion). A pair is
    an ANN hit iff flagged and subset-rank <= k. Both window functions
    share the sort — Spark plans one Sort + stacked Window ops."""
    scored_cells = queries.crossJoin(F.broadcast(index.centroids)).select(
        query_id,
        "cell_id",
        cosine_similarity(F.col(query_vec), F.col("centroid")).alias("__csim"),
    )
    w_cells = Window.partitionBy(query_id).orderBy(F.desc("__csim"), F.col("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(w_cells))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, "cell_id", F.lit(1).alias("__in_probe"))
    )
    # norms pre-projected per side (round 11): one HOF (the dot) per
    # pair instead of three — bit-identical sim (same IEEE op order)
    cand = (
        index.corpus.withColumn("__cn", l2_norm(index.vec_col))
        .crossJoin(F.broadcast(queries.withColumn("__qn", l2_norm(query_vec))))
        .filter(F.col(index.id_col) != F.col(query_id))
        .join(F.broadcast(probes), [query_id, "cell_id"], "left")
        .select(
            query_id,
            index.id_col,
            F.round(
                dot_product(F.col(index.vec_col), F.col(query_vec))
                / (F.col("__cn") * F.col("__qn")),
                4,
            ).alias("sim"),
            F.coalesce(F.col("__in_probe"), F.lit(0)).alias("__in_probe"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(index.id_col))
    ranked = cand.select(
        query_id,
        "__in_probe",
        F.row_number().over(w).alias("__exact_rn"),
        F.sum("__in_probe")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__ann_rn"),
    ).filter(F.col("__exact_rn") <= k)
    hit = (F.col("__in_probe") == 1) & (F.col("__ann_rn") <= k)
    return ranked.agg(
        F.count_distinct(query_id).alias("n_queries"),
        (
            F.sum(hit.cast("long")) >= F.lit(min_recall) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


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
    scored_cells = queries.withColumn("__qn", l2_norm(query_vec)).crossJoin(
        F.broadcast(index.centroids)
    ).select(
        query_id,
        query_vec,
        "__qn",
        "cell_id",
        cosine_similarity(F.col(query_vec), F.col("centroid")).alias("__csim"),
    )
    w_cells = Window.partitionBy(query_id).orderBy(F.desc("__csim"), F.col("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(w_cells))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, query_vec, "__qn", "cell_id")
    )
    # 2. candidates: corpus ∩ probed cells (the pruned scan), exact
    # cosine with per-side pre-projected norms (round 11 — one HOF per
    # pair instead of three; bit-identical sim)
    cand = index.corpus.withColumn("__cn", l2_norm(index.vec_col)).join(
        F.broadcast(probes), "cell_id"
    )
    if exclude_self:
        cand = cand.filter(F.col(index.id_col) != F.col(query_id))
    scored = cand.select(
        query_id,
        index.id_col,
        F.round(
            dot_product(F.col(index.vec_col), F.col(query_vec))
            / (F.col("__cn") * F.col("__qn")),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(index.id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
