"""Triangle counting with degree orientation (the "forward" algorithm;
Chiba–Nishizeki / Schank–Wagner).

The naive triangle join (E ⋈ E ⋈ E) explodes on skewed graphs: a hub
of degree h contributes h² wedges. Orienting every undirected edge
from its lower-(degree, id) endpoint to the higher one caps every
out-degree at O(√m), so the wedge join is bounded by Σ out-deg² =
O(m^1.5) REGARDLESS of hubs — the difference between a web-scale graph
finishing and not. The total order (degree, then id) also canonicalizes
each wedge, so the closing edge is probed with a pure equi-join (no
OR-condition join, which Spark would plan as a nested loop).

Exact integer counting — trivially engine-portable (q137 carries a
full DuckDB oracle of the same oriented algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from snowflake_cdc_spark.operators.util import ckpt_lazy


def orient_edges(undirected: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """(u, v, dv): each undirected edge {a, b} (canonical a < b, distinct)
    oriented from the lower-(deg, id) endpoint to the higher; dv = the
    head's degree rides along for wedge canonicalization."""
    deg = (
        undirected.select(F.col(a).alias("n"))
        .unionAll(undirected.select(F.col(b).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        undirected.join(deg.select(F.col("n").alias(a), F.col("d").alias("da")), a)
        .join(deg.select(F.col("n").alias(b), F.col("d").alias("db")), b)
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col(a) < F.col(b))
    )
    return e.select(
        F.when(a_first, F.col(a)).otherwise(F.col(b)).alias("u"),
        F.when(a_first, F.col(b)).otherwise(F.col(a)).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def triangle_count(undirected: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """One row (n_triangles): wedges from each tail, canonically ordered
    by (dv, v), closed by an equi-join probe into the oriented set."""
    # the oriented edge set feeds THREE consumers (both wedge sides and
    # the closing-edge probe); materialize it once (round 11) instead of
    # re-running the degree join + orientation subtree per consumer
    # the UNDIRECTED edge relation is itself read three times inside
    # orient_edges (two degree branches + the orientation join); for
    # q137 it is a lineitem self-join + distinct — materialize it once
    # (round 12), same treatment its oriented output already gets
    undirected = undirected.transform(ckpt_lazy)
    ort = orient_edges(undirected, a, b).transform(ckpt_lazy)
    left = ort.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    right = ort.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = left.join(right, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = ort.select(F.col("u").alias("x"), F.col("v").alias("y"))
    return wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
