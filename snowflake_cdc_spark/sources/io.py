"""Table readers for the driver fixtures.

One wrinkle: ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL).
We flip the runtime conf ``spark.sql.legacy.parquet.nanosAsLong`` so the
scan yields epoch-nanos longs, then rebuild microsecond timestamps with
*integer* division (``DIV 1000`` — floor, matching DuckDB's ns→us
truncation; floating division would round the last microsecond digit).
Nanos columns are detected from the parquet footer via pyarrow, so the
conversion is schema-driven, not name-driven.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    import pyarrow as pa

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    )


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    nanos = _nanos_timestamp_cols(path)
    if not nanos:
        return spark.read.parquet(path)
    # The conf is captured into the scan at DataFrame-creation time
    # (verified: executing the returned frame after restore still works),
    # so restore it immediately — leaving it set session-wide would make
    # every LATER read of a nanos file silently yield epoch-long columns
    # instead of failing loudly.
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df
