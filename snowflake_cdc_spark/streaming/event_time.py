"""Event-time normalization at stream-source boundaries.

Parquet written under Spark 4 defaults (and the driver's testdata) carries
``TIMESTAMP_NTZ`` event-time columns. Structured Streaming's
``withWatermark`` requires ``TIMESTAMP`` (it raises
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` on NTZ), and ``cast(ts AS BIGINT)``
rejects NTZ outright. Every watermark-bearing operator therefore funnels its
input through :func:`ensure_event_time`, which rewrites an NTZ event-time
column to ``TIMESTAMP`` (instant semantics). The engine pins
``spark.sql.session.timeZone=UTC`` (``session.py``), so the NTZ→LTZ cast is
a pure re-tagging of the same wall-clock values — batch/stream parity and
DuckDB-oracle comparisons are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ensure_event_time", "epoch_seconds"]


def ensure_event_time(df: DataFrame, *ts_cols: str) -> DataFrame:
    """Return ``df`` with each named column cast to ``TIMESTAMP`` if it is
    currently ``TIMESTAMP_NTZ`` (no-op otherwise, including for missing
    columns so callers can pass optional names)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    for c in ts_cols:
        if isinstance(fields.get(c), T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def epoch_seconds(col):
    """Epoch seconds for a timestamp column of either flavor
    (``TIMESTAMP`` or ``TIMESTAMP_NTZ``) — the NTZ-safe replacement for
    ``cast(ts AS LONG)``, which Spark rejects on NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c.cast("timestamp"))
