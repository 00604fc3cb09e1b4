"""Spark-4 modern-surface lane q112-q113: VARIANT semi-structured data
and the Python UDTF lane.

- q112: the reference maps arrays/unknown source types to Snowflake
  ``DbVariant`` (udt_map, add_output.py:43-57) — Spark 4's VARIANT type
  is the native equivalent. ``parse_json`` produces a binary-encoded
  variant (not a re-parsed string), ``variant_get`` path-extracts with a
  target type; both stay JVM-side and whole-stage-codegen'd. Oracle:
  DuckDB ``json_extract`` on the same path.
- q113: document chunking for context-window packing — split each
  document into fixed-token-budget chunks, the row-expanding transform a
  pretraining pipeline runs just before tokenization. Implemented as an
  arrow-optimized Python UDTF (the table-function lane of the Python
  surface: scalar pandas_udf q68 / grouped applyInPandas q69 /
  mapInPandas q34 / applyInPandasWithState streaming / UDTF here). A
  purely declarative sequence+slice+posexplode version would beat it at
  scale (no Python boundary) — the UDTF is registered deliberately to
  exercise and test the lane; the docstring trade-off IS the guidance.

Scale notes: q112 is a scan-side projection (no shuffle). q113 fans out
rows 1→ceil(n/512) inside the UDTF eval loop; Arrow batches bound the
Python transfer and the downstream aggregation partial-combines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from snowflake_cdc_spark.queries import _t, register

CHUNK = 32


@register(
    "q112_variant",
    """SELECT event_type,
              CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                AS sum_k,
              CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_k
       FROM events GROUP BY event_type ORDER BY event_type""",
    "VARIANT semi-structured lane: parse_json -> variant_get('$.k') "
    "(binary variant, codegen'd path extraction) aggregated per type — "
    "the Snowflake DbVariant parity surface",
)
def q112(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_k"),
        )
        .orderBy("event_type")
    )


@udtf(returnType="chunk_idx int, n_tokens int", useArrow=True)
class _ChunkDoc:
    """Yield (chunk_idx, n_tokens) per fixed-size token window of a
    whitespace-tokenized document. Kept payload-free in the query (the
    chunk text itself is re-derivable by slice) so the oracle compares
    exact integers, not engine-specific string joins."""

    def eval(self, text: str):
        if text is None:
            return
        n = text.count(" ") + 1 if text else 0
        full, rem = divmod(n, CHUNK)
        for i in range(full):
            yield i, CHUNK
        if rem:
            yield full, rem


@register(
    "q113_udtf_chunks",
    f"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
                   FROM documents),
            c AS (SELECT doc_id,
                         unnest(range(CAST(ceil(n / {CHUNK}.0) AS BIGINT))) AS chunk_idx,
                         n
                  FROM t WHERE n > 0)
        SELECT CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN (chunk_idx + 1) * {CHUNK} <= n THEN {CHUNK}
                             ELSE n - chunk_idx * {CHUNK} END) AS BIGINT)
                 AS total_tokens,
               CAST(max(chunk_idx) AS BIGINT) AS max_chunk_idx
        FROM c""",
    "Python UDTF lane: per-document context-window chunking "
    f"(fixed {CHUNK}-token windows), validated by total-token "
    "conservation; oracle derives the same chunks declaratively",
)
def q113(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    chunks = docs.lateralJoin(
        _ChunkDoc(F.col("text").outer()).alias("c")
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("chunk_idx").cast("long").alias("max_chunk_idx"),
    )
