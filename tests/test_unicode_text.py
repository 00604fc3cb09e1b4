"""Unicode word lane (round 8): the multilingual tokenization path and
the q220 audit proving the ASCII ``[a-z]+`` convention diverges on
non-Latin text."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import (
    UNICODE_WORD,
    script_of,
    unicode_words,
)
from snowflake_cdc_spark.queries import REGISTRY, _load_extended

MULTI = [
    (0, "Hello WORLD café"),
    (1, "Привет МИР привет"),
    (2, "你好世界 你好"),
    (3, "Öl über Étude Straße"),
    (4, "punct!!! 123 --- ..."),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(MULTI, "id int, text string")


def test_unicode_words_vs_ascii_lane(spark):
    """The verdict's required proof: on non-Latin text the ASCII lane
    returns a DIFFERENT (smaller, wrong) answer."""
    df = _df(spark).select(
        "id",
        F.size(unicode_words("text")).alias("n_uni"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("n_ascii"),
    )
    got = {r["id"]: (r["n_uni"], r["n_ascii"]) for r in df.collect()}
    assert got[0] == (3, 3)  # same count but [a-z]+ truncates 'café'→'caf'
    assert got[1] == (3, 0)  # Cyrillic: ASCII lane sees NOTHING
    assert got[2] == (2, 0)  # CJK: ASCII lane sees NOTHING
    assert got[3] == (4, 5)  # accents SPLIT words: 'straße'→'stra','e'
    assert got[4] == (1, 1)  # punct/digits agree
    assert got[5] == (0, 0)
    # the mangled-token case: equal counts but different tokens
    toks = (
        _df(spark)
        .filter("id = 3")
        .select(F.explode(unicode_words("text")).alias("w"))
        .collect()
    )
    assert {r["w"] for r in toks} == {"öl", "über", "étude", "straße"}


def test_script_buckets(spark):
    df = (
        _df(spark)
        .select(F.explode(unicode_words("text")).alias("w"))
        .withColumn("script", script_of("w"))
    )
    got = {r["w"]: r["script"] for r in df.collect()}
    assert got["hello"] == "latin"
    assert got["привет"] == "cyrillic"
    assert got["你好世界"] == "cjk"
    assert got["öl"] == "latin_ext"
    assert got["étude"] == "latin_ext"


def test_q220_shows_ascii_blindness(spark, duck):
    """q220's output itself carries the divergence: the cyrillic and cjk
    rows count tokens with ascii_capturable = 0."""
    _load_extended()
    rows = {
        r["script"]: r
        for r in REGISTRY["q220_unicode_tokens"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(rows) == {"latin", "latin_ext", "cyrillic", "cjk"}
    for script in ("cyrillic", "cjk"):
        assert rows[script]["n_tokens"] > 0
        assert rows[script]["ascii_capturable"] == 0
    # 'straße' leads with ASCII 's' (→ latin bucket by the first-char
    # heuristic) but is not ASCII-capturable — so <=, not ==
    assert 0 < rows["latin"]["ascii_capturable"] < rows["latin"]["n_tokens"]
    # latin_ext tokens lead with a non-ASCII letter by construction
    assert rows["latin_ext"]["ascii_capturable"] == 0


def test_unicode_word_regex_is_shared_subset():
    """Guard the pattern against drifting into engine-specific syntax
    (script classes spell differently in Java vs RE2)."""
    assert "\\p{IsC" not in UNICODE_WORD  # Java-only script spelling
    assert "(?<" not in UNICODE_WORD  # no lookbehind
    assert UNICODE_WORD == r"[\p{L}\p{M}]+"


def test_script_buckets_extended(spark):
    """Round-11 script_of extension (VERDICT r10 #5): greek carved out
    of latin_ext, hangul (jamo + syllables) carved out of cjk, arabic
    and devanagari out of 'other'."""
    rows = [
        ("κείμενο", "greek"),
        ("نص", "arabic"),
        ("परीक्षण", "devanagari"),
        ("테스트", "hangul"),   # syllables U+AC00-D7AF
        ("한", "hangul"),      # jamo U+1100-11FF
        ("你好", "cjk"),
        ("привет", "cyrillic"),
        ("öl", "latin_ext"),
        ("hello", "latin"),
    ]
    df = spark.createDataFrame([(w,) for w, _ in rows], "w string").withColumn(
        "script", script_of("w")
    )
    got = {r["w"]: r["script"] for r in df.collect()}
    assert got == dict(rows)
