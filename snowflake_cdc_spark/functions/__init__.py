"""Scalar / vector / text function surface (SURVEY.md §2.6, §2.8).

Everything here returns Column expressions built from
``pyspark.sql.functions`` so the hot path stays JVM-side inside
whole-stage codegen — no row-at-a-time Python.
"""

from snowflake_cdc_spark.functions.strings import string_format, actual_full_table_name
from snowflake_cdc_spark.functions.vectors import dot_product, l2_norm, cosine_similarity

__all__ = [
    "string_format",
    "actual_full_table_name",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
