"""Multi-source BFS / k-hop reachability with exact distances — the
graph-traversal lane beside components (q102/q118), PageRank (q136) and
triangles (q137). The warehouse uses: blast-radius analysis ("what can
a failing part reach in <= k hops"), recall expansion for retrieval,
lineage walks.

Frontier expansion, the scalable form: per hop, ONE join of the CURRENT
frontier (not the visited set, not the graph) against the edge list,
then an anti-join against the visited set so each node is settled
exactly once at its minimal distance — the textbook level-synchronous
BFS invariant. Work per hop is O(frontier-adjacent edges); the visited
set is persisted and the per-hop ``localCheckpoint`` keeps lineage flat
(components.py discipline). ``max_hops`` is fixed and small (the q136
fixed-rounds precedent), which is also what makes the whole traversal
DuckDB-oracle-checkable via a depth-bounded recursive CTE + min(dist)
— pure integer set algebra, nothing to drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from snowflake_cdc_spark.operators.util import ckpt_eager, ckpt_lazy


def khop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, dist): minimal hop distance from ANY seed, for every node
    within ``max_hops`` (seeds at dist 0)."""
    visited = seeds.select(node_col).distinct().withColumn(
        "dist", F.lit(0).cast("int")
    ).persist()
    n_prev = visited.count()
    frontier = visited.select(node_col)
    try:
        for h in range(1, max_hops + 1):
            nxt = (
                frontier.join(
                    edges, frontier[node_col] == edges[src_col]
                )
                .select(F.col(dst_col).alias(node_col))
                .distinct()
                .join(visited.select(node_col), node_col, "left_anti")
                .withColumn("dist", F.lit(h).cast("int"))
            )
            new_visited = visited.unionByName(nxt).transform(ckpt_lazy)
            new_visited = new_visited.persist()
            n_now = new_visited.count()
            visited.unpersist()
            visited = new_visited
            if n_now == n_prev:
                # frontier drained: every reachable node is settled —
                # stop instead of running empty-frontier no-op hops
                # (the count is the same driver scalar the persist
                # materialization already pays for)
                break
            n_prev = n_now
            frontier = visited.filter(F.col("dist") == h).select(node_col)
        # hand back a materialized copy and release the cache entry —
        # the loop's working persist must not leak across repeated calls
        # in one session (the determinism audit runs every query twice)
        out = visited.transform(ckpt_eager)
        visited.unpersist()
        return out
    except Exception:
        visited.unpersist()
        raise


def bounded_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Bounded Bellman-Ford: minimal WEIGHTED distance from any seed
    using at most ``rounds`` edges (integer weights -> every distance
    exact, the whole relaxation oracle-checkable via a depth-bounded
    recursive CTE + min — the khop_distances story generalized to
    weights). Per round: one join of the current distance table against
    the edge list + a map-side-combined min — the textbook distributed
    relaxation; localCheckpoint truncates lineage per round."""
    # Fixed rounds, no early exit (round 11): the per-round
    # persist+count materialization jobs were pure driver overhead —
    # each round's LAZY checkpoint already materializes exactly once
    # (covering its two consumers: next round's join and union) when
    # the single final action runs, and still truncates lineage.
    # rounds+1 driver jobs -> 1.
    dist = (
        seeds.select(node_col)
        .distinct()
        .withColumn("d", F.lit(0).cast("bigint"))
        .transform(ckpt_lazy)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist[node_col] == edges[src_col])
            .select(
                F.col(dst_col).alias(node_col),
                (F.col("d") + F.col(weight_col)).alias("d"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy(node_col)
            .agg(F.min("d").alias("d"))
            .transform(ckpt_lazy)
        )
    return dist.transform(ckpt_eager)
