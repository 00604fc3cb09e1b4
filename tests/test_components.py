"""Connected components (operators/components.py): planted clusters,
chains forcing multi-round propagation, and determinism across
partitionings."""

from __future__ import annotations

import random

from snowflake_cdc_spark.operators.components import connected_components


def _components(spark, edges, parts=None, algorithm="label"):
    df = spark.createDataFrame(edges, "src long, dst long")
    if parts:
        df = df.repartition(parts)
    out = connected_components(df, algorithm=algorithm)
    comp: dict[int, list[int]] = {}
    for r in out.collect():
        comp.setdefault(r.component, []).append(r.node)
    return {k: sorted(v) for k, v in sorted(comp.items())}


def test_planted_clusters(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    assert _components(spark, edges) == {
        1: [1, 2, 3],
        10: [10, 11],
        20: [20, 21, 22, 23],
    }


def test_long_chain_converges(spark):
    # a 16-node path: diameter 15, well past one round of propagation
    edges = [(i, i + 1) for i in range(100, 116)]
    comp = _components(spark, edges)
    assert comp == {100: list(range(100, 117))}


def test_bridged_cliques_merge(spark):
    # two cliques joined by a single bridge edge collapse to one component
    clique = lambda base: [(base + i, base + j) for i in range(4) for j in range(i + 1, 4)]
    edges = clique(0) + clique(50) + [(3, 50)]
    comp = _components(spark, edges)
    assert list(comp) == [0]
    assert comp[0] == [0, 1, 2, 3, 50, 51, 52, 53]


def test_partitioning_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 30, 2)] + [(i, i + 2) for i in range(0, 28, 4)]
    assert _components(spark, edges) == _components(spark, edges, parts=13)


def test_star_matches_label_on_planted_clusters(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    assert _components(spark, edges, algorithm="star") == _components(spark, edges)


def test_star_deep_chain(spark):
    # 40-node path: diameter 39 — label propagation would need ~39 rounds,
    # star contraction must finish well inside max_iter=25 (O(log d)).
    edges = [(i, i + 1) for i in range(200, 240)]
    comp = _components(spark, edges, algorithm="star")
    assert comp == {200: list(range(200, 241))}


def test_star_matches_label_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(55)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _components(spark, edges, algorithm="star") == _components(
        spark, edges, algorithm="label"
    )


def test_auto_uses_probe_then_star_on_deep_chain(spark):
    """algorithm='auto' must return CORRECT components on a graph whose
    diameter far exceeds the label-prop probe budget — i.e. the star
    fallback actually runs (plain label-prop capped at probe depth would
    return unconverged labels)."""
    from snowflake_cdc_spark.operators.components import (
        _label_prop,
        connected_components,
    )

    n = 400  # chain diameter 400 >> probe_iter
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    out = connected_components(edges, algorithm="auto", probe_iter=3).collect()
    assert len(out) == n
    assert all(r.component == 1 for r in out)
    # sanity of the probe premise: label-prop at probe depth is NOT done
    _, converged = _label_prop(edges, "src", "dst", 3)
    assert not converged


def test_auto_stays_on_label_prop_for_shallow_graphs(spark):
    """Shallow (pair/triangle) graphs — the near-dup regime — converge
    inside the probe, and auto's answer matches both dedicated lanes."""
    from snowflake_cdc_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)], "src long, dst long"
    )
    want = sorted(map(tuple, connected_components(edges, algorithm="star").collect()))
    got = sorted(map(tuple, connected_components(edges, algorithm="auto").collect()))
    assert got == want == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)]
