"""Unit tests on pure helpers (SURVEY.md §5.5): type mapping (incl. the
_-array and unknown-fallback paths), flatten/prefix rename, key hashing,
STRING_FORMAT compilation, Snowflake SQL generation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_cdc_spark.catalog import Catalog
from snowflake_cdc_spark.functions.strings import string_format
from snowflake_cdc_spark.operators.flatten import flatten, flatten_columns
from snowflake_cdc_spark.operators.upsert import synthetic_primary_key
from snowflake_cdc_spark.sinks.snowflake import ensure_table_ddl, merge_sql, sf_type
from snowflake_cdc_spark.typemap import DB_STRING, DB_VARIANT, resolve_udt


class TestTypeMap:
    def test_ints_collapse_to_long(self):
        # add_output.py:48-49: all integer widths → DbBigInt/number
        for udt in ["int2", "int4", "int", "int8", "bigint", "tinyint", "smallint"]:
            assert resolve_udt(udt).spark_type == T.LongType()

    def test_decimal_lossless_by_default_lossy_on_request(self):
        # divergence from add_output.py:52-54 (reference loses exactness)
        assert isinstance(resolve_udt("decimal").spark_type, T.DecimalType)
        assert resolve_udt("decimal", lossy_decimals=True).spark_type == T.DoubleType()

    def test_temporals_are_real_types(self):
        # divergence from add_output.py:46,54-56 (reference uses epoch numbers)
        assert resolve_udt("timestamp").spark_type == T.TimestampType()
        assert resolve_udt("datetime").spark_type == T.TimestampType()
        d = resolve_udt("date")
        assert d.spark_type == T.DateType() and d.is_date

    def test_array_prefix(self):
        # add_output.py:278-280: leading _ marks an array; lands as variant
        ti = resolve_udt("_varchar")
        assert ti.is_array
        assert ti.spark_type == T.ArrayType(T.StringType())
        assert ti.db_type == DB_VARIANT

    def test_unknown_falls_back_to_string(self):
        # add_output.py:283-285
        ti = resolve_udt("geometry")
        assert ti.spark_type == T.StringType()
        assert ti.is_fallback and ti.db_type == DB_STRING

    def test_bool_and_bit(self):
        assert resolve_udt("bool").spark_type == T.BooleanType()
        assert resolve_udt("bit").spark_type == T.BooleanType()


class TestCatalog:
    def test_columns_csv_roundtrip(self):
        cat = Catalog.from_columns_csv(
            "tpch.orders,o_orderkey,bigint,true\n"
            "tpch.orders,o_comment,_varchar,false\n"
            "tpch.orders,o_geo,geometry,false\n"
        )
        meta = cat.get("TPCH.ORDERS")  # case-insensitive lookup
        assert meta.primary_key_columns == ["o_orderkey"]
        assert meta.columns[1].type_info.is_array
        assert meta.columns[2].type_info.is_fallback

    def test_information_schema_contract_matches_csv(self):
        """S7 contract: rows shaped like the JDBC information_schema query
        (catalog.py:99-104, reference add_output.py:318-327) produce the
        same ColumnSpecs as the columns-file path. The fixture is an
        in-process DuckDB running the same query shape against a real
        information_schema — no live MySQL needed."""
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE SCHEMA tpch")
        con.execute(
            "CREATE TABLE tpch.orders (o_orderkey BIGINT PRIMARY KEY, "
            "o_comment VARCHAR, o_flag BOOLEAN)"
        )
        # DuckDB has no MySQL column_key; derive the PK flag from its
        # constraint catalog the way a JDBC dialect adapter would.
        rows = con.execute(
            """SELECT c.table_schema || '.' || c.table_name AS full_table_name,
                      c.column_name,
                      lower(c.data_type) AS udt_name,
                      coalesce(k.is_pk, FALSE) AS is_primary_key,
                      c.ordinal_position
               FROM information_schema.columns c
               LEFT JOIN (
                   SELECT table_name, unnest(constraint_column_names) AS column_name,
                          TRUE AS is_pk
                   FROM duckdb_constraints() WHERE constraint_type = 'PRIMARY KEY'
               ) k USING (table_name, column_name)
               WHERE c.table_schema = 'tpch'
               ORDER BY full_table_name, c.ordinal_position"""
        ).fetchall()
        dict_rows = [
            dict(zip(
                ["full_table_name", "column_name", "udt_name",
                 "is_primary_key", "ordinal_position"], r,
            ))
            for r in rows
        ]
        cat_jdbc = Catalog.from_information_schema_rows(dict_rows)
        cat_csv = Catalog.from_columns_csv(
            "tpch.orders,o_orderkey,bigint,true\n"
            "tpch.orders,o_comment,varchar,false\n"
            "tpch.orders,o_flag,boolean,false\n"
        )
        ma, mb = cat_jdbc.get("tpch.orders"), cat_csv.get("tpch.orders")
        assert [
            (c.name, c.udt_name, c.is_primary_key, c.type_info.spark_type)
            for c in ma.columns
        ] == [
            (c.name, c.udt_name, c.is_primary_key, c.type_info.spark_type)
            for c in mb.columns
        ]
        assert ma.primary_key_columns == ["o_orderkey"]


class TestFlatten:
    def test_nested_flatten(self, spark):
        df = spark.createDataFrame(
            [(1, ("a", (True, 2.5)), [1, 2])],
            "id int, s struct<x:string, t:struct<b:boolean, d:double>>, arr array<int>",
        )
        out = flatten(df)
        assert out.columns == ["id", "s_x", "s_t_b", "s_t_d", "arr"]
        row = out.collect()[0]
        assert row.s_t_d == 2.5
        assert row.arr == "[1,2]"  # arrays JSON-encoded (variant behavior)

    def test_prefix_expansion(self, spark):
        df = spark.createDataFrame([((7, "x"),)], "r struct<a:int, b:string>")
        cols = flatten_columns(df.schema["r"].dataType, "r.", "row_")
        out = df.select(cols)
        assert out.columns == ["row_a", "row_b"]


class TestKeys:
    def test_synthetic_key_deterministic_and_separator_safe(self, spark):
        df = spark.createDataFrame([("a", "b|c"), ("a|b", "c")], "x string, y string")
        out = synthetic_primary_key(df, ["x", "y"], "pk").select("pk").collect()
        # 'a' + 'b|c' must NOT collide with 'a|b' + 'c' (unit separator)
        assert out[0].pk != out[1].pk


class TestStringFormat:
    def test_positional_placeholders(self, spark):
        df = spark.createDataFrame([("db", "tbl")], "a string, b string")
        got = df.select(
            string_format("{0}.{1}", F.col("a"), F.col("b")).alias("s")
        ).collect()[0].s
        assert got == "db.tbl"

    def test_repeated_and_reordered(self, spark):
        df = spark.createDataFrame([("x", "y")], "a string, b string")
        got = df.select(
            string_format("{1}-{0}-{1}", F.col("a"), F.col("b")).alias("s")
        ).collect()[0].s
        assert got == "y-x-y"


class TestSnowflakeSql:
    SCHEMA = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("amount", T.DecimalType(18, 2)),
            T.StructField("seq", T.LongType()),
            T.StructField("is_delete", T.BooleanType()),
        ]
    )

    def test_ddl(self):
        ddl = ensure_table_ddl("t", self.SCHEMA, ["id"])
        assert "CREATE TABLE IF NOT EXISTS T" in ddl
        assert "TAGS VARIANT" in ddl  # arrays → variant (add_output.py:299-301)
        assert "AMOUNT NUMBER(18,2)" in ddl
        assert "PRIMARY KEY (ID)" in ddl

    def test_merge_hard_delete(self):
        sql = merge_sql("t", "t_stage", ["id"], ["id", "name", "seq"])
        assert "WHEN MATCHED AND s.IS_DELETE AND t.SEQ < s.SEQ THEN DELETE" in sql
        assert "WHEN MATCHED AND t.SEQ < s.SEQ THEN UPDATE SET t.NAME = s.NAME" in sql
        assert "WHEN NOT MATCHED AND NOT s.IS_DELETE THEN INSERT" in sql

    def test_merge_logical_delete(self):
        sql = merge_sql("t", "t_stage", ["id"], ["id", "name", "seq"], hard_delete=False)
        assert "THEN DELETE" not in sql
        assert "t.IS_DELETED = s.IS_DELETE" in sql

    def test_sf_type_fallbacks(self):
        assert sf_type(T.MapType(T.StringType(), T.LongType())) == "VARIANT"
        assert sf_type(T.TimestampNTZType()) == "TIMESTAMP_NTZ"
