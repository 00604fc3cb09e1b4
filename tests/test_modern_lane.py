"""Modern-surface lane (queries_modern_ext): UDTF chunker edge cases and
VARIANT null/malformed handling. Oracle parity for q112/q113 is covered
by test_queries.py; these pin the behaviors the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.queries_modern_ext import CHUNK, _ChunkDoc


def test_udtf_chunker_fanout_and_conservation(spark):
    n_tokens = CHUNK * 2 + 6
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * n_tokens)), (2, "a b"), (3, None)],
        "doc_id long, text string",
    )
    out = (
        df.lateralJoin(_ChunkDoc(F.col("text").outer()).alias("c"))
        .select("doc_id", "chunk_idx", "n_tokens")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    assert sorted(by_doc[1]) == [(0, CHUNK), (1, CHUNK), (2, 6)]
    assert by_doc[2] == [(0, 2)]
    assert 3 not in by_doc  # NULL text expands to zero rows, row dropped


def test_variant_get_missing_and_malformed(spark):
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"other": 1}',), ("not json",), (None,)],
        "props string",
    )
    got = df.select(
        F.try_variant_get(F.try_parse_json("props"), "$.k", "long").alias("k")
    ).collect()
    assert [r.k for r in got] == [5, None, None, None]
