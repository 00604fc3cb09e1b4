"""Round-9 unicode-default migration proof (VERDICT r08 #2).

The corpus-curation lanes switched their tokenizer from the ASCII
``[a-z]+`` convention to ``functions/text.py::UNICODE_WORD``
(``[\\p{L}\\p{M}]+``) in BOTH engines. Two facts make that safe and
worthwhile, and both are pinned here:

1. **Hash-neutral on the driver fixture**: over lowered all-ASCII text
   the two classes extract IDENTICAL token arrays — proven corpus-wide
   on the documents table (token-level equality implies every
   downstream count/shingle/KL/budget hash is unchanged).
2. **Divergent where it matters**: on non-Latin text the ASCII lane
   silently drops or mangles tokens that the Unicode lane counts —
   the q220 pattern, checked here at the operator level for a
   migrated lane (setsim shingles).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD
from snowflake_cdc_spark.queries import _t

SF = "/root/testdata/sf0.001"


def test_tokenizers_identical_on_ascii_fixture(spark):
    docs = _t(spark, SF, "documents")
    ascii_toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
    uni_toks = F.regexp_extract_all(F.lower("text"), F.lit(UNICODE_WORD), F.lit(0))
    n_diff = docs.filter(ascii_toks != uni_toks).count()
    assert n_diff == 0


def test_tokenizers_identical_on_ascii_fixture_duckdb():
    con = duckdb.connect()
    n_diff = con.execute(
        f"""SELECT count(*) FROM read_parquet('{SF}/documents.parquet')
            WHERE regexp_extract_all(lower(text), '[a-z]+')
               <> regexp_extract_all(lower(text), '[\\p{{L}}\\p{{M}}]+')"""
    ).fetchone()[0]
    assert n_diff == 0


def test_unicode_lane_catches_nonlatin(spark):
    rows = [
        (1, "Привет мир Привет мир Привет мир"),
        (2, "Zürich Étude naïve Zürich Étude naïve"),
        (3, "plain ascii text plain ascii text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    ascii_n = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0)))
    uni_n = F.size(F.regexp_extract_all(F.lower("text"), F.lit(UNICODE_WORD), F.lit(0)))
    got = {
        r["doc_id"]: (r["a"], r["u"])
        for r in df.select("doc_id", ascii_n.alias("a"), uni_n.alias("u")).collect()
    }
    assert got[1] == (0, 6)  # cyrillic: ASCII lane sees nothing
    # accented latin: ASCII splits around the accents (z + rich, tude,
    # na + ve -> 5 fragments per copy) while the unicode lane keeps the
    # 3 real words per copy
    assert got[2] == (10, 6)
    assert got[3] == (6, 6)  # pure ASCII: identical


def test_migrated_shingles_count_nonlatin(spark):
    from snowflake_cdc_spark.operators.setsim import shingle_sets

    df = spark.createDataFrame(
        [(1, "Привет мир снова Привет мир снова")], "doc_id int, text string"
    )
    toks = shingle_sets(df, n=3)
    assert toks.count() > 0, "unicode shingles must exist on cyrillic text"
