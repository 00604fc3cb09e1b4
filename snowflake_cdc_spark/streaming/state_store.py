"""Replay-safe parquet state reads shared by the incremental
maintainers (``SessionMaintainer`` / ``TransitionMaintainer`` /
``SetSimMaintainer`` — VERDICT r05 #5: the batch=N read logic lived
triplicated in the three maintainers; a fourth maintainer would have
copied it again, so the replay semantics now live HERE, once).

The maintainers write state under ``<dir>/batch=N`` subdirs (overwrite
per batch). Replay safety is one rule applied at READ time: a restart
that reprocesses batch N must never read batch N's own (possibly
partial) output — every read excludes ``batch == batch_id`` first.
From the surviving subdirs there are two store shapes:

- **snapshot stores** (one full compacted state per batch — open
  sessions, per-user last events): read the NEWEST remaining batch
  only (:func:`latest_snapshot`);
- **delta stores** (append-style — survivor postings, transition count
  deltas): read ALL remaining batches, optionally horizon-bounded
  (:func:`delta_batches`).

The one scalar ``collect()`` (newest remaining batch id) is a
metadata-sized fetch over the partition column, not a data read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["latest_snapshot", "delta_batches"]


def latest_snapshot(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    columns: list[str],
) -> DataFrame | None:
    """The newest state snapshot written BEFORE ``batch_id`` (projected
    to ``columns``), or None when no prior snapshot exists."""
    if not os.path.isdir(state_dir):
        return None
    st = spark.read.parquet(state_dir).filter(F.col("batch") != batch_id)
    top = st.agg(F.max("batch").alias("b")).collect()[0]["b"]
    if top is None:
        return None
    return st.filter(F.col("batch") == top).select(*columns)


def delta_batches(
    spark: SparkSession,
    delta_dir: str,
    batch_id: int,
    columns: list[str],
    horizon_batches: int | None = None,
) -> DataFrame | None:
    """All delta subdirs written BEFORE ``batch_id`` (projected to
    ``columns``; optionally only the last ``horizon_batches``), or None
    when the store does not exist yet."""
    if not os.path.isdir(delta_dir):
        return None
    d = spark.read.parquet(delta_dir).filter(F.col("batch") != batch_id)
    if horizon_batches is not None:
        d = d.filter(F.col("batch") > batch_id - horizon_batches)
    return d.select(*columns)
