"""Byte-level BPE (VERDICT r09 #4): GPT-2-style bytes-as-symbols
pre-tokenizer — the multilingual path the character lane's [a-z]+
contract can't serve. Proves the drop on planted Cyrillic/CJK words,
the marker-algebra merge semantics over the hex-pair alphabet, and the
no-unknown-token guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_cdc_spark.operators.bpe import (
    apply_byte_bpe,
    byte_word_frequencies,
    train_byte_bpe,
    word_frequencies,
)


def _corpus(spark):
    rows = [
        ("the cat sat on the mat the cat",),
        ("привет мир привет",),
        ("模型 训练 数据 模型",),
        ("déjà vu déjà",),
    ]
    return spark.createDataFrame(rows, "text string")


def test_char_lane_provably_drops_non_latin(spark):
    """The character lane's word_frequencies ([a-z]+) never emits a
    Cyrillic/CJK word — the exact blind spot the byte lane closes."""
    docs = _corpus(spark)
    char_vocab = {r["word"] for r in word_frequencies(docs).collect()}
    assert "привет" not in char_vocab and "模型" not in char_vocab
    assert "the" in char_vocab
    # 'déjà' survives only as its ASCII fragments
    assert "déjà" not in char_vocab and "d" in char_vocab

    byte_vocab = {r["word"] for r in byte_word_frequencies(docs).collect()}
    assert {"привет", "мир", "模型", "训练", "déjà", "the"} <= byte_vocab


def test_byte_tokens_cover_every_script(spark):
    """Zero merges: every word costs exactly its UTF-8 byte length —
    any representable string tokenizes (no unknown token)."""
    words = byte_word_frequencies(_corpus(spark))
    got = {
        r["word"]: r["n_bpe_tokens"]
        for r in apply_byte_bpe(words, []).collect()
    }
    assert got["the"] == 3  # 1 byte/char
    assert got["привет"] == 12  # 2 bytes/char (Cyrillic)
    assert got["模型"] == 6  # 3 bytes/char (CJK)
    assert got["déjà"] == 6  # 2 ASCII + 2x2-byte accents


def test_byte_merges_learn_multibyte_sequences(spark):
    """Training on a Cyrillic-heavy corpus merges the UTF-8 lead/tail
    byte pairs (the multi-byte codepoints reassemble), and applying the
    merges strictly reduces token counts."""
    docs = spark.createDataFrame(
        [("привет привет мир мир мир",)], "text string"
    )
    words = byte_word_frequencies(docs)
    merges = [tuple(m) for m in train_byte_bpe(words, rounds=4).collect()]
    assert len(merges) == 4
    # every learned symbol is a hex string of whole bytes
    for _, l, r, merged, cnt in merges:
        assert merged == l + r and len(merged) % 2 == 0
        assert cnt >= 2
    before = {
        r["word"]: r["n_bpe_tokens"]
        for r in apply_byte_bpe(words, []).collect()
    }
    after = {
        r["word"]: r["n_bpe_tokens"]
        for r in apply_byte_bpe(words, merges).collect()
    }
    assert all(after[w] < before[w] for w in after)  # merges bite everywhere
    # 'мир' (3 codepoints, 6 bytes) with 4 merges on this corpus packs
    # into at most 3 tokens; exactness is pinned by the q241/q242 oracles
    assert after["мир"] <= 3


def test_exhausted_vocab_keeps_oracle_and_spark_aligned(spark):
    """A corpus whose pair table runs dry before ``rounds`` rounds:
    Spark breaks the training loop early and applies the shorter merge
    list; the oracle chain's LEFT-JOIN guard must keep later w{r}
    rounds as identity passes instead of collapsing the vocabulary to
    the empty relation (the round-10 review finding)."""
    import duckdb

    from snowflake_cdc_spark.operators.bpe import (
        _byte_bpe_chain_ctes,
        byte_bpe_oracle_sql,
    )

    rows = [("aa aa aa",)]  # one word, one byte pair -> dry by round 2
    docs = spark.createDataFrame(rows, "text string")
    words = byte_word_frequencies(docs)
    merges = [tuple(m) for m in train_byte_bpe(words, rounds=6).collect()]
    assert len(merges) < 6  # the loop really broke early
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT 'aa aa aa' AS text")
    want = con.execute(byte_bpe_oracle_sql(rounds=6, table="docs")).fetchall()
    assert [tuple(m) for m in merges] == [tuple(w) for w in want]
    # the tokenization read off the FINAL w{rounds} must survive the
    # dry rounds: 'aa' fully merged -> exactly 1 token in both engines
    got = {
        r["word"]: r["n_bpe_tokens"]
        for r in apply_byte_bpe(words, merges).collect()
    }
    ctes = _byte_bpe_chain_ctes(6, "docs")
    w6 = con.execute(
        f"WITH {', '.join(ctes)} SELECT word, "
        "CAST(len(string_split(w, chr(30))) - 1 AS BIGINT) FROM w6"
    ).fetchall()
    assert dict(w6) == got == {"aa": 1}


def test_training_equals_oracle_chain(spark):
    """train_byte_bpe == the DuckDB byte CTE chain on a planted corpus
    (the q241 parity, pinned at unit scale)."""
    import duckdb

    from snowflake_cdc_spark.operators.bpe import byte_bpe_oracle_sql

    rows = [("привет мир the the cat 模型",), ("мир мир déjà the",)]
    docs = spark.createDataFrame(rows, "text string")
    got = [
        tuple(m)
        for m in train_byte_bpe(byte_word_frequencies(docs), rounds=5).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"('{r[0]}')" for r in rows)
        + ") t(text)"
    )
    want = con.execute(byte_bpe_oracle_sql(rounds=5, table="docs")).fetchall()
    assert got == [tuple(w) for w in want]
