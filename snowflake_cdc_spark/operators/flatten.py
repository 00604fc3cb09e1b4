"""Flatten / prefix star-expansion (SURVEY.md §2.2 P2/P11).

The reference declares ``shouldFlatten: True`` (add_output.py:114) and its
README documents ``SELECT data.row.* AS row_*`` prefix expansion
(README.md:20-24,34). Here that is a schema-introspection helper emitting
``col("a.b.c").alias("a_b_c")`` — a driver-side plan rewrite, so Catalyst
still sees plain column projections (column pruning + pushdown intact; no
UDF, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _quote(part: str) -> str:
    return f"`{part}`" if ("." in part or "`" in part) else part


def flatten_columns(
    schema: T.StructType,
    prefix_path: str = "",
    prefix_name: str = "",
    sep: str = "_",
    arrays_as_json: bool = True,
) -> list[Column]:
    """Recursively expand nested structs into flat aliased columns.

    ``a.b.c`` becomes column ``a_b_c``. Arrays (and maps) are left intact
    or JSON-encoded (``to_json``) when ``arrays_as_json`` — matching the
    reference's arrays→variant behavior (add_output.py:299-301) where
    semi-structured values land as one JSON-ish column.
    """
    cols: list[Column] = []
    for f in schema.fields:
        path = f"{prefix_path}{_quote(f.name)}"
        name = f"{prefix_name}{f.name}"
        if isinstance(f.dataType, T.StructType):
            cols.extend(
                flatten_columns(f.dataType, path + ".", name + sep, sep, arrays_as_json)
            )
        elif isinstance(f.dataType, (T.ArrayType, T.MapType)) and arrays_as_json:
            cols.append(F.to_json(F.col(path)).alias(name))
        else:
            cols.append(F.col(path).alias(name))
    return cols


def flatten(df: DataFrame, sep: str = "_", arrays_as_json: bool = True) -> DataFrame:
    """Flatten every nested struct in ``df`` into top-level columns."""
    return df.select(flatten_columns(df.schema, sep=sep, arrays_as_json=arrays_as_json))


def expand_struct(
    df: DataFrame, struct_path: str, prefix: str, keep: list[Column] | None = None
) -> DataFrame:
    """``SELECT data.row.* AS <prefix>*`` — expand one nested struct with a
    name prefix (README.md:34), optionally keeping extra columns.

    The struct's fields are discovered from ``df.schema`` (schema-on-read;
    the reference's "dynamic schema" posture, README.md:34).
    """
    # walk the schema to the struct
    node: T.DataType = T.StructType(df.schema.fields)
    for part in struct_path.split("."):
        assert isinstance(node, T.StructType), f"{struct_path} is not a struct path"
        node = node[part].dataType
    assert isinstance(node, T.StructType), f"{struct_path} is not a struct"
    expanded = [
        F.col(f"{struct_path}.{_quote(f.name)}").alias(f"{prefix}{f.name}")
        for f in node.fields
    ]
    return df.select(*(keep or []), *expanded)
