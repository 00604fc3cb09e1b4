"""SemDeDup scaling probe with cell-balance report: clustered 16-dim
vectors (the operator's regime — embeddings cluster). Reports the cell
histogram alongside the pair count, because Sum(|cell|^2) IS the cost
model: cluster granularity (k) must grow with the corpus exactly as
IVF's does, and a collapsed clustering goes quadratic (documented
caveat)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowflake_cdc_spark.session import get_spark
from snowflake_cdc_spark.operators.kmeans_exact import kmeans_fit
from snowflake_cdc_spark.operators.semdedup import semantic_dup_pairs

spark = get_spark(app_name="probe_r6b")
spark.sparkContext.setLogLevel("ERROR")

n = 100_000
emb = spark.range(n).select(
    F.col("id").alias("vec_id"),
    F.expr(
        "transform(sequence(1, 16), i -> "
        "CAST((CAST(pmod(xxhash64(pmod(id, 200), i), 2001) - 1000 AS DOUBLE)"
        " + CAST(pmod(xxhash64(id, i + 99), 201) - 100 AS DOUBLE) * 0.5)"
        " / 1000.0 AS FLOAT))"
    ).alias("embedding"),
).localCheckpoint(eager=True)

t0 = time.perf_counter()
_, assigned = kmeans_fit(emb, k=64, rounds=2)
cells = assigned.groupBy("cell").count()
stats = cells.agg(
    F.count(F.lit(1)).alias("cells"),
    F.max("count").alias("mx"),
    F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
).collect()[0]
print(
    f"kmeans(64, 2 rounds): {time.perf_counter()-t0:.1f} s, "
    f"{stats.cells} nonempty cells, max {stats.mx}, "
    f"sum|cell|^2 = {stats.sum_sq/1e6:.0f}M pair slots",
    flush=True,
)
t0 = time.perf_counter()
pairs = semantic_dup_pairs(emb, t_num=9, t_den=10, k=64, rounds=2, dim=16)
npairs = pairs.count()
print(
    f"semdedup(100k x 16d clustered, 64 cells): "
    f"{time.perf_counter() - t0:.1f} s :: {npairs} dup pairs",
    flush=True,
)
