"""Connected components over a pair/edge list — the clustering step of a
near-duplicate pipeline (N2): pair detectors (MinHash-LSH q25, SimHash
q26, blocked Jaccard q27, quantization q96) emit edges; keeping one
document per *component* (not per pair) is what actually dedups a
corpus, because near-duplication is transitive in practice (A~B, B~C ⇒
keep one of {A,B,C}).

Algorithm: minimum-label propagation. Every node starts labeled with its
own id; each round, a node adopts the smallest label among itself and
its neighbors; at fixpoint the label is the component minimum (a
canonical representative). Convergence takes O(component diameter)
rounds — near-dup clusters are shallow (pairs/cliques/short chains), so
2-4 rounds in practice; each round is one join + one groupBy on the
edge list, all shuffles on the node key. Lineage is truncated per round
(localCheckpoint) so plans don't grow with iterations. For adversarial
deep graphs, swap in large-star/small-star (Kiveris et al., "Connected
Components in MapReduce") — same per-round primitive, O(log n) rounds;
not needed for dedup-shaped inputs.

Not expressible in one SQL query without recursion — the DuckDB oracle
for q102 uses a recursive CTE (transitive closure), an independent
algorithm, making this the engine's oracle-checked iterative lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough).
    Deterministic: labels are ids, min is total — same result on any
    partitioning or iteration interleaving.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def dedup_representatives(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """From near-dup pairs, return (node, component): keep rows whose id
    equals their component to retain exactly one document per cluster;
    anti-join the rest away."""
    return connected_components(pairs, src=id_a, dst=id_b)
