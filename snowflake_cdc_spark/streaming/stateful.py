"""Custom stateful streaming operators (SURVEY.md §2.8 UDF surface).

``applyInPandasWithState`` is the sanctioned escape hatch when built-in
streaming aggregations can't express the semantics: user-defined state per
key, Arrow-batched, checkpointed by the engine. The demo operator keeps a
running per-key event count + last-seen value — the building block for
per-key rate limits, dedup memories, or CDC conflict detection.

Batch parity: ``running_totals_batch`` computes the same result with a
plain aggregation, and the parity test drives both over the same input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n LONG, total DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})


def running_totals_stream(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Streaming: per-key running (count, sum) maintained in group state.
    Emits the updated totals for every key touched by each micro-batch."""
    keyed = events.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_processor():
    """Spark-4 ``transformWithState`` successor of ``_update``: explicit
    named state slots (``getValueState``) with optional TTL, timers, and
    the RocksDB state-store v2 format underneath. Same semantics as the
    ``applyInPandasWithState`` path — the parity test drives both.
    A factory so importing this module never requires the new API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return _Proc()


def running_totals_stream_v2(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Streaming per-key running totals on the ``transformWithStateInPandas``
    lane. Requires (a) the RocksDB state store provider on the query and
    (b) ``google.protobuf`` in the Python workers — the TWS state-server
    protocol is protobuf-framed (pyspark .../proto/StateMessage_pb2.py).
    Environments without protobuf keep the ``running_totals_stream``
    (applyInPandasWithState) lane, which has identical semantics."""
    keyed = events.select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=running_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def running_totals_batch(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Batch equivalent: the final state every key converges to."""
    return (
        events.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col)).cast("double").alias("total"),
        )
    )
