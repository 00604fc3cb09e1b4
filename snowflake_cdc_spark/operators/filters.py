"""Predicate operators (SURVEY.md §2.2 P1/P9/P10).

The reference's filter is an ``EqualToFilterV2`` feature over a field vs a
string literal with ``enabled``/``inverted`` flags
(add_output.py:366-406). Spark-side these are plain Column predicates —
declared here so the pipeline spec has a serializable form, compiled to
``df.filter`` so Catalyst pushes them into the parquet scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class EqualToFilter:
    """``field = literal`` (or ``<>`` when inverted) — add_output.py:394."""

    field: str
    literal: object
    inverted: bool = False
    enabled: bool = True

    def to_column(self) -> Column:
        pred = F.col(self.field) == F.lit(self.literal)
        return ~pred if self.inverted else pred

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.enabled:
            return df
        return df.filter(self.to_column())


def filter_table(df: DataFrame, full_table_name: str, field: str = "data.full_table_name") -> DataFrame:
    """Keep only one table's events from the multiplexed CDC stream
    (README.md:26, add_output.py:366-406). Equality on a scan column →
    Catalyst pushes it down to the parquet reader."""
    return EqualToFilter(field=field, literal=full_table_name).apply(df)
