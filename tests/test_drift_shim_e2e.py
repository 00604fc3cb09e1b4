"""E2/E3 drift through the DuckDB shim warehouse (VERDICT r08 #7): the
Snowflake-dialect ALTER TABLE widen (E2, ``widen_ddl``) and the
prefer-incoming-on-tie backfill MERGE (E3) EXECUTE end-to-end on the
shim's SQL surface — the S3/S4 posture applied to schema evolution.

Drive: batch 1 lands the narrow schema; a column appears (drift); E1
detects it against the live warehouse information_schema; E2 widens via
the generated ALTER; batch 2 merges rows carrying the new column; E3
backfills history by replaying old seqs with ``<=`` tie semantics. The
final warehouse snapshot must equal the relational
``snapshot_hard_delete`` over the widened log.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from snowflake_cdc_spark.catalog import TableMeta
from snowflake_cdc_spark.operators.upsert import latest_by_key, snapshot_hard_delete
from snowflake_cdc_spark.sinks.duckdb_shim import (
    execute_snowflake_sql,
    translate_statement,
)
from snowflake_cdc_spark.sinks.snowflake import SnowflakeMergeSink
from snowflake_cdc_spark.streaming.evolution import detect_new_columns, widen_ddl
from snowflake_cdc_spark.typemap import ColumnSpec

def _c(v):
    return "\x00" if v is None else str(v)


NARROW = ["primary_key", "seq", "is_delete", "o_totalprice"]
WIDE = NARROW + ["o_comment"]


def _rows(con, table):
    cols = [d[0].lower() for d in con.execute(f"SELECT * FROM {table} LIMIT 0").description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = con.execute(f"SELECT * FROM {table}").fetchall()
    return sorted(tuple(_c(r[i]) for i in order) for r in rows), sorted(cols)


def _warehouse_columns(con, table):
    return [
        r[0]
        for r in con.execute(
            "SELECT column_name FROM information_schema.columns "
            f"WHERE table_name = '{table}' ORDER BY ordinal_position"
        ).fetchall()
    ]


def test_drift_widen_and_backfill_through_shim(spark, tmp_path):
    con = duckdb.connect()
    sink = SnowflakeMergeSink(str(tmp_path / "stage"))

    # ---- batch 1: narrow schema ----------------------------------------
    b1 = spark.createDataFrame(
        [(f"k{i}", 10 + i, False, float(i)) for i in range(4)],
        "primary_key string, seq bigint, is_delete boolean, o_totalprice double",
    )
    execute_snowflake_sql(
        con,
        sink.write_batch(b1, "orders_snap", ["primary_key"], batch_id=0),
    )
    assert "O_COMMENT" not in _warehouse_columns(con, "ORDERS_SNAP")

    # ---- drift: E1 detect against the LIVE warehouse schema ------------
    meta = TableMeta(
        "tpch.orders",
        [
            ColumnSpec("primary_key", "varchar", is_primary_key=True),
            ColumnSpec("seq", "int8"),
            ColumnSpec("o_totalprice", "float8"),
            ColumnSpec("o_comment", "varchar"),
        ],
    )
    new = detect_new_columns(meta, _warehouse_columns(con, "ORDERS_SNAP"))
    assert new == ["o_comment"]

    # ---- E2 widen: the generated ALTER executes on the shim ------------
    for ddl in widen_ddl("orders_snap", [("o_comment", "VARCHAR")]):
        for stmt in translate_statement(ddl):
            con.execute(stmt)
    assert "O_COMMENT" in _warehouse_columns(con, "ORDERS_SNAP")
    # idempotent: IF NOT EXISTS re-runs cleanly
    for ddl in widen_ddl("orders_snap", [("o_comment", "VARCHAR")]):
        for stmt in translate_statement(ddl):
            con.execute(stmt)

    # ---- batch 2: new rows carry the new column ------------------------
    b2 = spark.createDataFrame(
        [(f"k{i}", 20 + i, False, float(i), f"c{i}") for i in range(4, 6)],
        "primary_key string, seq bigint, is_delete boolean, "
        "o_totalprice double, o_comment string",
    )
    execute_snowflake_sql(
        con,
        sink.write_batch(b2, "orders_snap", ["primary_key"], batch_id=1),
    )
    got, _ = _rows(con, "ORDERS_SNAP")
    assert ("c4", "4.0", "k4", "24") in got  # cols sorted: comment, price, pk, seq
    assert not any(t[0] == "c0" for t in got)  # history still NULL-comment

    # ---- E3 backfill: replay OLD seqs carrying the new column ----------
    backfill = spark.createDataFrame(
        [(f"k{i}", 10 + i, False, float(i), f"c{i}") for i in range(4)],
        "primary_key string, seq bigint, is_delete boolean, "
        "o_totalprice double, o_comment string",
    )
    execute_snowflake_sql(
        con,
        sink.write_batch(
            backfill,
            "orders_snap",
            ["primary_key"],
            batch_id=2,
            prefer_incoming_on_tie=True,
        ),
    )

    # final warehouse state == relational merge over the widened log
    log = b1.withColumn("o_comment", F.lit(None).cast("string")).unionByName(
        b2
    ).unionByName(backfill)
    # backfill rows replay the same seqs with MORE data: emulate the
    # prefer-incoming tie by ranking (seq, has_comment)
    want_df = snapshot_hard_delete(
        latest_by_key(
            log.withColumn("__fill", F.col("o_comment").isNotNull().cast("int")),
            ["primary_key"],
            ["seq", "__fill"],
        ).drop("__fill"),
        ["primary_key"],
        "seq",
    )
    want_cols = sorted(want_df.columns)
    want = sorted(tuple(_c(r[c]) for c in want_cols) for r in want_df.collect())
    got, got_cols = _rows(con, "ORDERS_SNAP")
    assert got_cols == want_cols
    assert got == want
    # every historical row now carries its backfilled comment
    assert all(t[0] != "\x00" for t in got)

    # replaying the backfill once more is a no-op (idempotent even at <=)
    execute_snowflake_sql(
        con,
        sink.write_batch(
            backfill, "orders_snap", ["primary_key"], batch_id=3,
            prefer_incoming_on_tie=True,
        ),
    )
    assert _rows(con, "ORDERS_SNAP")[0] == got


def test_translate_rejects_unknown_statement():
    with pytest.raises(ValueError):
        translate_statement("DROP TABLE X")
