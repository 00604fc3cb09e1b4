"""IVF-PQ: compose the two ANN scale paths — cell pruning × code
compression (the architecture of FAISS ``IndexIVFPQ``, Jégou 2011 §V).

At 100 TB the two operators attack orthogonal costs and compose
multiplicatively:

- **IVF** (``operators/ivf.py``) prunes WHICH vectors are scored: a
  query touches ``nprobe / n_cells`` of the corpus (partition-pruned
  scan when the codes table is partitioned by ``cell_id``).
- **PQ** (``operators/pq.py``) shrinks WHAT is scanned: 8-byte codes
  instead of 256-byte raw vectors (32×), scored by LUT-ADC with only
  ``(code, query_id)`` crossing the Arrow boundary.

Combined: a probe reads ``nprobe/n_cells × 1/32`` of the raw corpus
bytes before the tiny exact re-rank.

Variant note: this is *raw-vector* PQ under IVF routing (codebooks
trained on the vectors themselves), not FAISS's residual-PQ refinement
(codebooks on ``v − centroid``). Residual coding buys accuracy when
cells are tight relative to codeword resolution; at k=256 codewords on
these 64-dim corpora raw-vector PQ already reaches 0.99 recall@5
(docs/ANN.md), and raw coding keeps the codes table valid under cell
reassignment and reusable without the IVF layer. Exactness anchor: at
``nprobe = n_cells`` and an uncapped shortlist the search degenerates
to exact brute force (proven in ``tests/test_pq.py``).
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
from snowflake_cdc_spark.operators.ivf import IvfIndex, build_ivf
from snowflake_cdc_spark.operators.pq import (
    PqIndex,
    _adc_udf,
    build_pq,
    encode_with,
)


@dataclass
class IvfPqIndex:
    """centroids (tiny) + one codes table carrying BOTH the cell id and
    the PQ code per vector — a single relation, built in one distributed
    pass over the corpus (assignment UDF then encode UDF, fused by
    Catalyst into one Python-worker stage)."""

    ivf: IvfIndex
    pq: PqIndex
    id_col: str
    vec_col: str


def build_ivfpq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    k: int = 256,
    seed: int = 42,
    max_iter: int = 20,
    train_sample: int = 100_000,
) -> IvfPqIndex:
    """Both trainings share ONE bounded md5-keyed sample — collected
    here once and passed to both (two scans/collects of the same rows
    otherwise); the corpus-wide pass assigns cells and encodes codes in
    ONE plan (``pq.codes`` is lazy — nothing is computed twice)."""
    from snowflake_cdc_spark.operators.ivf import bounded_md5_sample

    rows = bounded_md5_sample(corpus, id_col, [id_col, vec_col], train_sample)
    ivf = build_ivf(
        corpus, id_col, vec_col, n_cells=n_cells, seed=seed, max_iter=max_iter,
        train_sample=train_sample, sample_rows=rows,
    )
    pq = build_pq(
        corpus, id_col, vec_col, m=m, k=k, seed=seed, max_iter=max_iter,
        train_sample=train_sample, sample_rows=rows,
    )
    # re-point the codes relation at the cell-assigned corpus: one pass
    # computes (id, vec, cell_id, code)
    pq.codes = encode_with(pq, ivf.corpus)
    return IvfPqIndex(ivf=ivf, pq=pq, id_col=id_col, vec_col=vec_col)


def ivfpq_search(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 50,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors: probe ``nprobe`` cells per query, LUT-ADC
    the probed cells' CODES, exact-cosine re-rank the top-``shortlist``.
    Output (query_id, <id_col>, sim)."""
    # 1. query -> nprobe nearest cells (same probe block as ivf_search)
    scored_cells = queries.crossJoin(F.broadcast(index.ivf.centroids)).select(
        query_id,
        "cell_id",
        cosine_similarity(F.col(query_vec), F.col("centroid")).alias("__csim"),
    )
    w_cells = Window.partitionBy(query_id).orderBy(F.desc("__csim"), F.col("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(w_cells))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, "cell_id")
    )
    # 2. candidates = codes of probed cells only; ADC carries just
    #    (query_id, id, adc) into the shortlist window
    adc = _adc_udf(index.pq, queries, query_id, query_vec)
    cand = index.pq.codes.select(index.id_col, "cell_id", "code").join(
        F.broadcast(probes), "cell_id"
    )
    if exclude_self:
        cand = cand.filter(F.col(index.id_col) != F.col(query_id))
    approx = cand.select(
        query_id, index.id_col, adc(F.col("code"), F.col(query_id)).alias("__adc")
    )
    w_short = Window.partitionBy(query_id).orderBy("__adc", index.id_col)
    shortlisted = (
        approx.withColumn("__srn", F.row_number().over(w_short))
        .filter(F.col("__srn") <= shortlist)
        .select(query_id, index.id_col)
    )
    # 3. exact re-rank of |queries| x shortlist survivors
    rescored = (
        shortlisted.join(
            index.pq.codes.select(
                index.id_col, index.vec_col
            ).withColumn("__cn", l2_norm(index.vec_col)),
            index.id_col,
        )
        .join(F.broadcast(queries.withColumn("__qn", l2_norm(query_vec))), query_id)
        .select(
            query_id,
            index.id_col,
            F.round(
                dot_product(F.col(index.vec_col), F.col(query_vec))
                / (F.col("__cn") * F.col("__qn")),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(index.id_col))
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_recall_check(
    index: IvfPqIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 12,
    shortlist: int = 200,
    min_recall: float = 0.9,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """One-row (n_queries, recall_ok): recall@k of the COMPOSED
    IVF-PQ search against the exhaustive top-k, scoring every candidate
    ONCE (the q52/q133 single-pass pattern, now with both pruning layers
    reconstructed from flags):

    - ``__in_probe``: the candidate's cell is among the query's nprobe
      nearest (left-join against the probe table).
    - rank *within the probed subset* under the shortlist order
      ``(adc asc, id)`` = running sum of the probe flag over that
      order — exactly the rank ``ivfpq_search``'s shortlist window
      assigns (same order restricted to the same subset).
    - ``__in_short`` = probed AND probe-subset-rank <= shortlist; the
      ANN rank after exact re-rank = running sum of ``__in_short`` over
      ``(sim desc, id)`` — again the identical order ``ivfpq_search``
      uses. A pair is an ANN hit iff shortlisted and ann-rank <= k.

    Two stacked window chains share two sorts total (adc order, sim
    order) over ONE |corpus|x|queries| candidate relation — vs three
    full scoring passes for the naive search-twice-and-join."""
    scored_cells = queries.crossJoin(F.broadcast(index.ivf.centroids)).select(
        query_id,
        "cell_id",
        cosine_similarity(F.col(query_vec), F.col("centroid")).alias("__csim"),
    )
    w_cells = Window.partitionBy(query_id).orderBy(F.desc("__csim"), F.col("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(w_cells))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id, "cell_id", F.lit(1).alias("__flag"))
    )
    adc = _adc_udf(index.pq, queries, query_id, query_vec)
    # norms pre-projected per side (round 11): one HOF (the dot) per
    # candidate pair instead of three — bit-identical sim
    cand = (
        index.pq.codes.withColumn("__cn", l2_norm(index.vec_col))
        .crossJoin(F.broadcast(queries.withColumn("__qn", l2_norm(query_vec))))
        .filter(F.col(index.id_col) != F.col(query_id))
        .join(F.broadcast(probes), [query_id, "cell_id"], "left")
        .select(
            query_id,
            index.id_col,
            adc(F.col("code"), F.col(query_id)).alias("__adc"),
            F.round(
                dot_product(F.col(index.vec_col), F.col(query_vec))
                / (F.col("__cn") * F.col("__qn")),
                4,
            ).alias("sim"),
            F.coalesce(F.col("__flag"), F.lit(0)).alias("__in_probe"),
        )
    )
    w_adc = Window.partitionBy(query_id).orderBy("__adc", index.id_col)
    run = w_adc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = cand.withColumn(
        "__in_short",
        (
            (F.col("__in_probe") == 1)
            & (F.sum("__in_probe").over(run) <= shortlist)
        ).cast("int"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(index.id_col))
    ranked = flagged.select(
        query_id,
        "__in_short",
        F.row_number().over(w).alias("__exact_rn"),
        F.sum("__in_short")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__ann_rn"),
    ).filter(F.col("__exact_rn") <= k)
    hit = (F.col("__in_short") == 1) & (F.col("__ann_rn") <= k)
    return ranked.agg(
        F.count_distinct(query_id).alias("n_queries"),
        (
            F.sum(hit.cast("long")) >= F.lit(min_recall) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )
