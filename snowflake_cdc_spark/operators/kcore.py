"""k-core decomposition by iterative peeling — the graph-robustness
lane beside components (q102/q118), PageRank (q136), triangles (q137)
and BFS (q151/q167). The warehouse uses: dense-community extraction
("the stable co-purchase nucleus" for recommendations), spam/bot-ring
detection (cores that survive high k), and graph-sparsification before
an expensive downstream pass.

Peeling, the scalable form: per round, one map-side-combined degree
count over the CURRENT edge set, then the edge set drops every edge
touching a peeled (deg < k) node. Two structural choices keep the
rounds cheap at 100 TB:

- **Anti-join against the PEELED set, not semi-join against the
  survivors**: after the first round the peeled delta is a small
  fraction of the nodes (and shrinks geometrically on real graphs), so
  the per-round edge filter is two anti-joins against a relation the
  optimizer can broadcast — never a shuffle join against the large
  survivor set. The first round, where the delta CAN be large, pays at
  most one extra broadcast threshold decision made by AQE, not by us.
- **Fixed ``max_rounds`` with drained-early exit** (the q136/q151
  precedent): the round count is bounded and the early-exit scalar
  reuses the count the per-round persist materialization already pays
  for. Fixed rounds are also what make the whole fixpoint loop
  DuckDB-oracle-checkable via an unrolled CTE chain — and because a
  fixpoint is idempotent, a run that drains at round r < R equals the
  oracle's full R-round unroll exactly.

Everything is integer set algebra (degrees, counts, node ids): nothing
to quantize, nothing to drift — the iterative-algorithm-made-
hash-checkable discipline of q136/q157 applied to graph peeling.
Reference parity: the reference (add_output.py:421-448) lands CDC rows;
this is a warehouse-side graph-analytics pass over the landed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from snowflake_cdc_spark.operators.util import ckpt_eager, ckpt_lazy


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Nodes of the k-core of an undirected graph, with their degree
    INSIDE the core.

    ``edges`` must carry each undirected edge in BOTH directions with
    no self-loops and no duplicates (the q136/q137 co-purchase build) —
    then ``groupBy(src).count()`` is exactly the undirected degree.

    Returns (node, deg): the survivors of ``max_rounds`` peeling rounds
    (equivalently THE k-core whenever the loop drains early, which the
    planted tests and the registry lane assert). ``deg`` is the degree
    computed in the FINAL peel round — over the previous round's
    survivor subgraph — matching the oracle's R-round CTE unroll on
    both the drained path (where it equals the core-internal degree by
    idempotence) and the max_rounds-exhausted path (which additionally
    logs a warning: that result is a partial peel, not a fixpoint).
    """
    cur = edges.select(src_col, dst_col).persist()
    cur.count()
    deg = None
    drained = False
    try:
        for _ in range(max_rounds):
            if deg is not None:
                deg.unpersist()
            deg = (
                cur.groupBy(F.col(src_col).alias("node"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
                .persist()
            )
            peeled = deg.filter(F.col("deg") < k).select("node")
            # the persist materialization doubles as the early-exit scalar
            n_peeled = peeled.count()
            if n_peeled == 0:
                drained = True
                break
            nxt = (
                cur.join(
                    peeled.withColumnRenamed("node", src_col), src_col, "left_anti"
                )
                .join(
                    peeled.withColumnRenamed("node", dst_col), dst_col, "left_anti"
                )
                .transform(ckpt_lazy)
                .persist()
            )
            nxt.count()
            cur.unpersist()
            cur = nxt
        if deg is None:  # max_rounds == 0 degenerate call
            deg = cur.groupBy(F.col(src_col).alias("node")).agg(
                F.count(F.lit(1)).cast("bigint").alias("deg")
            )
        if not drained:
            # max_rounds hit without draining: emit the LAST computed deg
            # (d_R over the round-(R-1) survivor subgraph) — exactly the
            # oracle's R-round CTE unroll — rather than recomputing a
            # (R+1)-th degree stage the oracle never runs (ADVICE r05);
            # and say so loudly, because the result is a partial peel
            import logging

            logging.getLogger(__name__).warning(
                "kcore(k=%d): max_rounds=%d exhausted without draining — "
                "emitting the round-%d peel state, NOT a fixpoint",
                k,
                max_rounds,
                max_rounds,
            )
        out = deg.filter(F.col("deg") >= k).transform(ckpt_eager)
        return out
    finally:
        cur.unpersist()
        if deg is not None:
            try:
                deg.unpersist()
            except Exception:
                pass
