"""Fixed-point PageRank — iterative link analysis with EXACT integer
arithmetic, so a fixed-iteration run is bit-identical on any engine.

Float PageRank cannot be oracle-checked exactly: the per-node sum of
neighbor contributions is a float reduction whose order Spark does not
(and should not) fix. This implementation scales ranks by 10^9 into
BIGINTs; contributions use integer division (`div` — truncation; both
engines agree on non-negative operands) and the damping step is
``(85 * s) div 100`` — every intermediate is an exact integer, every
aggregation a BIGINT sum (order-independent), so N iterations produce
the identical rank vector everywhere. The truncated remainders (< 1e-9
of rank mass per edge per round) are the documented, deterministic
divergence from textbook float PageRank; dangling-mass redistribution
is likewise omitted on both sides (isolated nodes keep the base rank).

Scale shape per iteration: one join of the rank vector to the edge
list on src (both hash-partitioned on the same key — AQE reuses the
layout), one map-side-combined sum per dst. No driver-side state: the
loop unrolls into a single Catalyst plan of depth ``iterations`` (use
``localCheckpoint`` between rounds past ~10 iterations to truncate
lineage, as ``operators/components.py`` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000  # rank 1.0 == 10^9
BASE = 150_000_000  # (1 - d) * SCALE at d = 0.85


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """(node, rank) after ``iterations`` damped rounds; rank is the
    10^9-scaled BIGINT fixed-point value."""
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select(F.col(node), F.lit(SCALE).cast("bigint").alias("rank"))
    for _ in range(iterations):
        r_src = ranks.select(F.col(node).alias(src), "rank")
        contrib = (
            r_src.join(deg, src)
            .join(edges, src)
            .select(F.col(dst).alias("__to"), F.expr("rank div __deg").alias("__c"))
        )
        sums = contrib.groupBy("__to").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.select(node)
            .join(sums, F.col(node) == F.col("__to"), "left")
            .select(
                F.col(node),
                (
                    F.lit(BASE).cast("bigint")
                    + F.expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) div 100")
                ).alias("rank"),
            )
        )
    return ranks
