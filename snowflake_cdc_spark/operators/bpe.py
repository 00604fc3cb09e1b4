"""Iterative BPE (byte-pair-encoding) vocabulary training — corpus-level
merge-pair learning for the training-data tokenizer lane (VERDICT r03
#6; completes the story q32's fixed-proxy tokenizer started).

Classic BPE (Sennrich et al. 2016) with the standard scale trick: train
on the WORD-FREQUENCY table, not the raw corpus. At 100 TB the corpus
collapses to its vocabulary (heavy-tailed, ~10^6 distinct words) in one
explode+groupBy scan; every subsequent round touches only vocab-sized
relations — pair counting is one groupBy over adjacent symbol pairs
weighted by word count, and the winning merge is applied by an
expression-level string ``replace`` (no Python UDF anywhere).

Determinism (the q136 fixed-rounds precedent, making the whole training
DuckDB-oracle-checkable):

- exact BIGINT pair counts (occurrences weighted by word frequency,
  every adjacent position counted — Sennrich's ``get_stats`` behavior);
- winner per round = ORDER BY (pair_count DESC, left, right) LIMIT 1 —
  a total order, no float anywhere;
- the merge rewrite is greedy-left-to-right-non-overlapping BY
  CONSTRUCTION: words are stored with every symbol WRAPPED in open/close
  markers (``\\x1e a \\x1f \\x1e b \\x1f ...``) so
  ``replace(w, ‹l›‹r›, ‹lr›)`` — the same non-overlapping left-to-right
  scan in Spark and DuckDB — implements exactly the BPE merge.
  BOTH boundaries must be explicit: a prefix-only marker lets a merge
  pattern match where ``r`` is merely a PREFIX of the next symbol
  (``·aa·a`` would corrupt ``·aa·ab``), and a single shared separator
  breaks greedy chaining (``·a·a·`` consumes the next pair's left
  boundary). Wrapped symbols share no characters between adjacent
  matches: ``‹a›‹a›‹a›‹a› -> ‹aa›‹aa›``, and ``‹aa›‹a›`` cannot touch
  ``‹aa›‹ab›``.

The per-round winner is a 1-row ``collect`` (a driver scalar, the
components/pagerank fixpoint discipline); ``rounds`` is fixed and
small, so lineage stays shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SO = "\x1e"  # symbol-open marker
SC = "\x1f"  # symbol-close marker; both excluded from symbols by contract


def word_frequencies(
    docs: DataFrame, text_col: str = "text", pattern: str = "[a-z]+"
) -> DataFrame:
    """corpus -> (word, cnt): THE scale reduction of BPE training. The
    ``pattern`` contract also guarantees symbols never contain the
    marker byte."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _pairs(words: DataFrame, sym_pattern: str = "[a-z]+") -> DataFrame:
    """(w: marker-wrapped symbol string, cnt) -> (l, r, pair_count)
    over every adjacent symbol position."""
    # symbols match ``sym_pattern`` by the lane's contract ([a-z]+ for
    # the character lane, [0-9a-f]+ for the byte lane) — extract them
    # directly rather than splitting around markers
    syms = F.regexp_extract_all(F.col("w"), F.lit(sym_pattern), 0)
    adj = F.filter(
        F.transform(
            syms,
            lambda x, i: F.struct(
                x.alias("l"), F.try_element_at(syms, i + F.lit(2)).alias("r")
            ),
        ),
        lambda p: p["r"].isNotNull(),
    )
    return (
        words.select(F.explode(adj).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )


def train_bpe(words: DataFrame, rounds: int = 8) -> DataFrame:
    """Learn ``rounds`` merges from a (word, cnt) frequency table.
    Returns one row per learned merge:
    (merge_round, left_s, right_s, merged, pair_count)."""
    wrapped = words.select(
        F.regexp_replace(F.col("word"), "(.)", SO + "$1" + SC).alias("w"),
        F.col("cnt"),
    )
    return _train_loop(wrapped, rounds, "[a-z]+")


def _train_loop(wrapped: DataFrame, rounds: int, sym_pattern: str) -> DataFrame:
    """The shared merge-learning loop over a pre-wrapped (w, cnt)
    relation — identical for the character and byte lanes; only the
    initial wrapping and the symbol alphabet differ.

    One job per round (round 11): only the BASE wrapped relation is
    persisted; each round's rewrite stays a LAZY ``replace`` projection
    chained on top of it, so the per-round winner job (TakeOrdered over
    the pair counts) is the only action. Catalyst collapses the chained
    projections into one expression, so round ``r`` pays ``r`` nested
    string replaces over the vocab-sized relation — O(rounds²) cheap
    narrow work total, instead of a persist+count materialization pass
    per round (2 jobs/round -> 1; the vocab relation is bounded by the
    corpus VOCABULARY, never the corpus, so the recompute never grows
    with data). Same winners, same algebra, hash-identical merges."""
    spark = wrapped.sparkSession
    cur = wrapped.persist()
    merges: list[tuple] = []
    try:
        for r in range(1, rounds + 1):
            best = (
                _pairs(cur, sym_pattern)
                .orderBy(F.desc("pair_count"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:  # vocabulary fully merged — no pairs left
                break
            l, rt, cnt = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
            merges.append((r, l, rt, l + rt, cnt))
            cur = cur.withColumn(
                "w",
                F.call_function(
                    "replace",
                    F.col("w"),
                    F.lit(SO + l + SC + SO + rt + SC),
                    F.lit(SO + l + rt + SC),
                ),
            )
    finally:
        wrapped.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_round int, left_s string, right_s string, "
        "merged string, pair_count bigint",
    )


def apply_bpe(words: DataFrame, merges: list[tuple], word_col: str = "word") -> DataFrame:
    """Tokenize the vocabulary with a learned merge list: apply the
    merges IN TRAINING ORDER (each one the same greedy non-overlapping
    ``replace`` used during training) and return
    (word, n_bpe_tokens). The merge list is tiny (``rounds`` entries) so
    the application composes into one projection — the scalable shape
    is vocab-level tokenization + a broadcast join back to the corpus
    (see q146), never re-scanning documents per merge."""
    w = F.regexp_replace(F.col(word_col), "(.)", SO + "$1" + SC)
    return _apply_merges(words, w, merges, word_col)


def _apply_merges(
    words: DataFrame, wrapped, merges: list[tuple], word_col: str
) -> DataFrame:
    """Shared apply loop (character + byte lanes): compose the learned
    merges in training order over a pre-wrapped column and count the
    resulting symbols."""
    w = wrapped
    for m in merges:
        l, rt = m[1], m[2]
        w = F.call_function(
            "replace", w, F.lit(SO + l + SC + SO + rt + SC), F.lit(SO + l + rt + SC)
        )
    return words.select(
        F.col(word_col),
        (F.size(F.split(w, SO)) - 1).cast("bigint").alias("n_bpe_tokens"),
    )


def _bpe_chain_ctes(rounds: int, table: str) -> list[str]:
    """The shared CTE chain: words -> w0 -> (p{r}, m{r}, w{r})* — every
    ``w{r}`` carries the original ``word`` so downstream oracles can
    join tokenizations back to the corpus."""
    ctes = [
        (
            "words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt "
            "FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w "
            f"FROM {table}) GROUP BY 1)"
        ),
        (
            "w0 AS (SELECT word, regexp_replace(word, '(.)', "
            "chr(30)||'\\1'||chr(31), 'g') AS w, cnt FROM words)"
        ),
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"p{r} AS (SELECT pr[1] AS l, pr[2] AS r2, "
            "CAST(sum(cnt) AS BIGINT) AS pair_count "
            f"FROM (SELECT regexp_extract_all(w, '[a-z]+') AS s, cnt FROM w{r-1}), "
            "UNNEST(list_zip(s, s[2:])) AS u(pr) "
            "WHERE pr[2] IS NOT NULL GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{r} AS (SELECT {r} AS merge_round, l AS left_s, r2 AS right_s, "
            f"l||r2 AS merged, pair_count FROM p{r} "
            "ORDER BY pair_count DESC, l, r2 LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not a cross join: when a round's pair table
        # is EMPTY (vocabulary fully merged before ``rounds`` rounds) the
        # word survives unchanged — mirroring the Spark loop's early
        # break — instead of every later w{r} collapsing to the empty
        # relation and silently zeroing downstream tokenizations
        ctes.append(
            f"w{r} AS (SELECT word, "
            "CASE WHEN m.left_s IS NULL THEN w ELSE replace(w, "
            "chr(30)||m.left_s||chr(31)||chr(30)||m.right_s||chr(31), "
            "chr(30)||m.merged||chr(31)) END AS w, cnt "
            f"FROM w{r-1} LEFT JOIN m{r} m ON TRUE)"
        )
    return ctes


def bpe_oracle_sql(rounds: int = 8, table: str = "documents") -> str:
    """The COMPLETE DuckDB oracle for ``train_bpe``: the fixed training
    rounds unrolled as a CTE chain (pair counts -> total-order winner ->
    greedy rewrite per round) — token-for-token the same arithmetic and
    the same ``replace`` scan semantics as the Spark loop."""
    ctes = _bpe_chain_ctes(rounds, table)
    union = " UNION ALL ".join(
        f"SELECT merge_round, left_s, right_s, merged, pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return f"WITH {', '.join(ctes)} {union} ORDER BY merge_round"


# --------------------------------------------------------------------------
# Byte-level lane (round 10, VERDICT r09 #4): GPT-2-style bytes-as-symbols
# --------------------------------------------------------------------------
#
# The character lane's [a-z]+ symbol contract silently DROPS every word
# with no ASCII-letter content — a Cyrillic or CJK word contributes zero
# tokens (functions/text.py ledger). The byte-level pre-tokenizer closes
# that on its own terms: every word becomes its UTF-8 byte sequence, each
# byte rendered as a lowercase hex pair ('d0', '9f', ...), and the SAME
# marker algebra learns merges over the [0-9a-f]{2} alphabet. Byte
# symbols can never collide with the \x1e/\x1f markers (hex digits
# only), and merged symbols stay [0-9a-f]+ strings, so the wrap/replace
# machinery ports unchanged — exactly the GPT-2 posture (any Unicode
# text is representable; no unknown token exists).


def byte_wrapped(col):
    """word -> marker-wrapped lowercase-hex UTF-8 byte symbols."""
    return F.regexp_replace(
        F.lower(F.hex(F.encode(col, "UTF-8"))),
        "([0-9a-f]{2})",
        SO + "$1" + SC,
    )


def byte_word_frequencies(
    docs: DataFrame, text_col: str = "text", pattern: str = r"[\p{L}\p{M}]+"
) -> DataFrame:
    """corpus -> (word, cnt) over UNICODE words — the byte lane's scale
    reduction keeps every script (the character lane's [a-z]+ contract
    is exactly what this lane exists to drop). Same reduction as
    ``word_frequencies``, different default token class."""
    return word_frequencies(docs, text_col, pattern)


def train_byte_bpe(words: DataFrame, rounds: int = 8) -> DataFrame:
    """Byte-level BPE training: the _train_loop winner/replace algebra
    over hex-pair byte symbols. Returns (merge_round, left_s, right_s,
    merged, pair_count) with symbols as lowercase hex strings."""
    wrapped = words.select(byte_wrapped(F.col("word")).alias("w"), F.col("cnt"))
    return _train_loop(wrapped, rounds, "[0-9a-f]+")


def apply_byte_bpe(
    words: DataFrame, merges: list[tuple], word_col: str = "word"
) -> DataFrame:
    """Tokenize the vocabulary with learned byte merges (training-order
    greedy replace — the shared ``_apply_merges`` loop over the byte
    wrapping): (word, n_bpe_tokens)."""
    return _apply_merges(words, byte_wrapped(F.col(word_col)), merges, word_col)


def _byte_bpe_chain_ctes(rounds: int, table: str) -> list[str]:
    """DuckDB CTE chain for the byte lane: Unicode word frequencies ->
    hex-pair wrapping -> the same p{r}/m{r}/w{r} winner/replace rounds
    with the [0-9a-f]+ symbol alphabet. hex(encode(x)) is the UTF-8
    byte sequence in both engines (lowercased for parity)."""
    ctes = [
        (
            "words AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt "
            "FROM (SELECT unnest(regexp_extract_all(lower(text), "
            f"'[\\p{{L}}\\p{{M}}]+')) AS w FROM {table}) GROUP BY 1)"
        ),
        (
            "w0 AS (SELECT word, regexp_replace(lower(hex(encode(word))), "
            "'([0-9a-f]{2})', chr(30)||'\\1'||chr(31), 'g') AS w, cnt "
            "FROM words)"
        ),
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"p{r} AS (SELECT pr[1] AS l, pr[2] AS r2, "
            "CAST(sum(cnt) AS BIGINT) AS pair_count "
            f"FROM (SELECT regexp_extract_all(w, '[0-9a-f]+') AS s, cnt FROM w{r-1}), "
            "UNNEST(list_zip(s, s[2:])) AS u(pr) "
            "WHERE pr[2] IS NOT NULL GROUP BY 1, 2)"
        )
        ctes.append(
            f"m{r} AS (SELECT {r} AS merge_round, l AS left_s, r2 AS right_s, "
            f"l||r2 AS merged, pair_count FROM p{r} "
            "ORDER BY pair_count DESC, l, r2 LIMIT 1)"
        )
        # same empty-round guard as _bpe_chain_ctes (Spark breaks early)
        ctes.append(
            f"w{r} AS (SELECT word, "
            "CASE WHEN m.left_s IS NULL THEN w ELSE replace(w, "
            "chr(30)||m.left_s||chr(31)||chr(30)||m.right_s||chr(31), "
            "chr(30)||m.merged||chr(31)) END AS w, cnt "
            f"FROM w{r-1} LEFT JOIN m{r} m ON TRUE)"
        )
    return ctes


def byte_bpe_oracle_sql(rounds: int = 8, table: str = "documents") -> str:
    """Complete DuckDB oracle for ``train_byte_bpe`` (the
    bpe_oracle_sql shape over the byte chain)."""
    ctes = _byte_bpe_chain_ctes(rounds, table)
    union = " UNION ALL ".join(
        f"SELECT merge_round, left_s, right_s, merged, pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return f"WITH {', '.join(ctes)} {union} ORDER BY merge_round"


def bpe_apply_oracle_sql(rounds: int = 8, table: str = "documents") -> str:
    """Oracle for the tokenizer-APPLY lane (q146): re-derive the merges
    with the same chain, read each word's final representation off
    ``w{rounds}``, and aggregate per-source token totals."""
    ctes = _bpe_chain_ctes(rounds, table)
    ctes.append(
        f"tok AS (SELECT word, CAST(len(string_split(w, chr(30))) - 1 AS BIGINT) "
        f"AS n_tok FROM w{rounds})"
    )
    ctes.append(
        "docw AS (SELECT source, "
        "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
        f"FROM {table})"
    )
    return (
        f"WITH {', '.join(ctes)} "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(length(word)) AS BIGINT) AS n_char_tokens, "
        "CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens "
        "FROM docw JOIN tok USING (word) GROUP BY source ORDER BY source"
    )
