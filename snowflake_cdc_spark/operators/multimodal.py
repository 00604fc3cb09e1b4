"""Multimodal column conventions (SURVEY.md §2.8 N4).

Images / audio / video travel as opaque ``binary`` payloads with a typed
metadata struct; decode and feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no image/audio
libraries in this container — clearly marked below); everything Spark
cares about — schema, batch shape, partitioning, UDF signatures — is real
and tested.

At 100 TB the pattern matters more than the codec: payloads stay in
columnar storage next to their metadata (no sidecar fetches), decode is a
narrow per-partition map (no shuffle), and feature extraction emits
fixed-width columns so downstream joins/aggregations leave Python
entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(payload: bytes, fmt: str):  # pragma: no cover - stub
    """STUB: real decode needs PIL / libav, not present in this container.
    The Spark-side plumbing around it (schema, Arrow batching, partition
    mapping) is the deliverable; swap this body for the real codec."""
    raise NotImplementedError(
        "media decode requires an image/audio library not available here"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: byte histogram
    folded to ``dim`` doubles, numpy-vectorized (a per-byte Python loop
    measured ~3× slower end-to-end on the documents fixture — inside a
    Pandas UDF the per-element work must stay in C)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    acc = arr.reshape(-1, dim).sum(axis=0, dtype=np.int64)
    total = max(int(acc.sum()), 1)
    return (acc / total).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one Python worker per partition, pandas in/out — the
    only sanctioned Python boundary shape for bulk media work.
    """
    import hashlib

    from snowflake_cdc_spark.operators.util import fan_out

    media = fan_out(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(bytes(b), dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat each document's utf-8 bytes as
    an opaque payload with image-ish metadata — exercises the real binary
    column path end to end."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
