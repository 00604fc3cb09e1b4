#!/usr/bin/env python
"""Measure COMPOSED IVF-PQ recall@5 (ivfpq_search vs exact brute force)
across shortlist/nprobe operating points — the evidence behind the
docs/ANN.md composed table and the q144 registry bound.

    python tools/ivfpq_recall.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

SFS = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
K = 5


def main() -> None:
    from pyspark.sql import functions as F

    from snowflake_cdc_spark.operators.ivfpq import build_ivfpq, ivfpq_search
    from snowflake_cdc_spark.operators.similarity import cosine_topk
    from snowflake_cdc_spark.session import get_spark
    from snowflake_cdc_spark.sources.io import read_table

    spark = get_spark(app_name="ivfpq_recall")
    for sf in SFS:
        emb = read_table(spark, sf, "embeddings")
        queries = emb.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).persist()
        truth = {
            (r["query_id"], r["vec_id"])
            for r in cosine_topk(emb, queries, k=K).collect()
        }
        index = build_ivfpq(emb, n_cells=16, m=8, k=256)
        index.pq.codes = index.pq.codes.persist()
        index.pq.codes.count()
        for nprobe in (12, 16):
            for shortlist in (100, 150, 200):
                t0 = time.perf_counter()
                got = {
                    (r["query_id"], r["vec_id"])
                    for r in ivfpq_search(
                        index, queries, k=K, nprobe=nprobe, shortlist=shortlist
                    ).collect()
                }
                dt = time.perf_counter() - t0
                recall = len(got & truth) / len(truth)
                print(
                    f"{sf} nprobe={nprobe} shortlist={shortlist} "
                    f"recall@{K}={recall:.3f} ({dt:.1f}s)",
                    flush=True,
                )
        queries.unpersist()
        index.pq.codes.unpersist()


if __name__ == "__main__":
    main()
