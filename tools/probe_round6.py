"""Round-6 scaling probes (docs/PLANS.md): the new operators at
probe scale on local[32] — sort-free rank over a Zipf vocab, quantile
sketch over 50M rows, shard manifest over 5M docs, SemDeDup at 100k
vectors."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from snowflake_cdc_spark.session import get_spark

spark = get_spark(app_name="probe_r6")
spark.sparkContext.setLogLevel("ERROR")


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{name}: {time.perf_counter() - t0:.1f} s :: {out}", flush=True)


def probe_rank():
    # Zipf-ish counts over 10M distinct words: ~half hapaxes, heavy head
    from snowflake_cdc_spark.operators.rank import skewed_count_rank

    n = 10_000_000
    uni = spark.range(n).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("w"),
        F.expr(
            "CAST(CASE WHEN id % 2 = 0 THEN 1 "
            "WHEN id % 100 < 90 THEN 1 + pmod(xxhash64(id), 63) "
            "WHEN id % 10000 < 9990 THEN 64 + pmod(xxhash64(id), 4000) "
            "ELSE 100000 + pmod(xxhash64(id), 1000000) END AS BIGINT)"
        ).alias("cu"),
    )
    ranked = skewed_count_rank(uni, "cu", "w", ascending=False)
    chk = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rn").alias("s"),
        F.max("rn").alias("mx"),
    ).collect()[0]
    assert chk.n == n and chk.mx == n and chk.s == n * (n + 1) // 2, chk
    return f"10M-word Zipf vocab ranked; rank set == 1..N verified"


def probe_sketch():
    from snowflake_cdc_spark.operators.quantile_sketch import (
        bottomk_sample,
        quantile_estimates,
        rank_check,
    )

    n = 50_000_000
    df = spark.range(n).select(
        F.col("id").cast("string").alias("pk"),
        F.expr("CAST(pmod(xxhash64(id, 7), 1000000) AS BIGINT)").alias("v"),
    )
    smp = bottomk_sample(df, "v", "pk", k=256)
    est = quantile_estimates(smp, [250000, 500000, 750000, 900000])
    out = rank_check(df, "v", est).collect()
    assert len(out) == 4 and all(r.within_bound for r in out), out
    errs = [abs(r.r_hi * 1e6 / r.n - r.q_ppm) / 1e6 for r in out]
    return f"50M rows; all 4 in DKW bound; max rank err {max(errs):.4f}"


def probe_shards():
    from snowflake_cdc_spark.operators.sharding import shard_manifest

    n = 5_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr("repeat('tok ', CAST(5 + pmod(xxhash64(id), 60) AS INT))").alias(
            "text"
        ),
    )
    m = shard_manifest(docs, shard_tokens=100_000, seed=7)
    agg = m.agg(
        F.count(F.lit(1)).alias("shards"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_docs").alias("docs"),
        F.max("n_tokens").alias("mx"),
    ).collect()[0]
    assert agg.docs == n
    return (
        f"5M docs / {agg.tok/1e6:.0f}M tokens -> {agg.shards} shards, "
        f"max shard {agg.mx} tokens (bound {100_000 + 64})"
    )


def probe_semdedup():
    from snowflake_cdc_spark.operators.semdedup import semantic_dup_pairs

    n = 100_000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), i -> "
            "CAST(pmod(xxhash64(id, i), 2001) - 1000 AS FLOAT) / 1000.0)"
        ).alias("embedding"),
    )
    pairs = semantic_dup_pairs(emb, t_num=9, t_den=10, k=64, rounds=2, dim=16)
    return f"100k x 16-dim, 64 cells: {pairs.count()} dup pairs"


timed("rank(zipf 10M)", probe_rank)
timed("quantile_sketch(50M)", probe_sketch)
timed("shard_manifest(5M docs)", probe_shards)
timed("semdedup(100k x 16d, 64 cells)", probe_semdedup)
