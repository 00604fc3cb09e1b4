"""Exact set-similarity join via prefix filtering (PPJoin family —
Chaudhuri/Ganti/Kaushik SSJoin 2006, Xiao et al. PPJoin 2011): ALL
document pairs with Jaccard(shingle sets) >= t, WITHOUT the all-pairs
compare and WITHOUT the false negatives of MinHash banding
(``operators/dedup.py`` finds near-dups probabilistically; this lane is
the exact counterpart for when recall must be 1.0 — legal-hold dedup,
contamination audits).

The prefix-filtering principle: order every set by one GLOBAL token
order (rarest-first by document frequency, ties by token) and keep only
each set's first ``|x| - ceil(t*|x|) + 1`` tokens as its PREFIX. Any
pair with Jaccard >= t MUST share a prefix token (pigeonhole on the
sorted overlap), so the candidate join runs on prefixes only — and
because prefixes hold each document's RAREST tokens, the inverted-index
join is self-deskewing: a token appearing in many documents has high df
and is pushed out of prefixes. A second classic prune: Jaccard >= t
bounds sizes to ``t*|A| <= |B| <= |A|/t``, applied as an integer
cross-multiplication inside the candidate join.

Determinism: everything is exact integer algebra — df counts, prefix
length ``sz - ((num*sz + den - 1) div den) + 1`` (integer ceil of
``t*sz``, avoiding 0.6*5 = 3.0000000000000004 float surprises), and the
verify ``den*inter >= num*union`` (the linkage.py integer-threshold
precedent). Completeness vs brute force is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from snowflake_cdc_spark.functions.text import UNICODE_WORD


def shingle_sets(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tok): each document's DISTINCT word n-gram shingles.

    The word array is BOUND to a column before the transform lambda
    references it: inlining the ``regexp_extract_all`` expression into
    the lambda re-evaluates the full-text regex PER ARRAY ELEMENT (no
    CSE across lambda scopes — measured ~10 s of a 12 s query at sf0.1;
    bound form: ~1 s)."""
    w = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(UNICODE_WORD), 0)
    base = docs.select(F.col(id_col), w.alias("__w"))
    wc = F.col("__w")
    gram = F.transform(
        F.slice(wc, 1, F.greatest(F.size(wc) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", *[F.element_at(wc, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return base.select(F.col(id_col), F.explode(gram).alias("tok")).distinct()


def allpairs_jaccard_join(
    toks: DataFrame,
    threshold_num: int = 6,
    threshold_den: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """The direct exact form: inverted-index token join -> per-pair
    intersection counts -> integer-threshold verify. Identical output to
    ``prefix_filter_join`` (asserted in tests). Cost is Σ_tok df(tok)² —
    fine while postings are thin (this corpus), quadratic death under a
    boilerplate shingle; ``prefix_filter_join`` is the form that
    survives that regime (planted-skew bound asserted in tests)."""
    tn, td = threshold_num, threshold_den
    a = toks.select(F.col(id_col).alias("da"), "tok")
    b = toks.select(F.col(id_col).alias("db"), "tok")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    inter = (
        a.join(b, "tok")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("da"), F.col("sz").alias("sa")), "da"
        )
        .join(sizes.select(F.col(id_col).alias("db"), F.col("sz").alias("sb")), "db")
        .filter(
            td * F.col("n_inter")
            >= tn * (F.col("sa") + F.col("sb") - F.col("n_inter"))
        )
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_inter",
            (F.col("sa") + F.col("sb") - F.col("n_inter")).alias("n_union"),
        )
        .orderBy("doc_a", "doc_b")
    )


def prefix_candidates(
    toks: DataFrame,
    threshold_num: int = 6,
    threshold_den: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs (da < db) from shared PREFIX tokens + the integer
    size filter — the pruning half of ``prefix_filter_join``, exposed so
    tests can assert the postings bound directly."""
    tn, td = threshold_num, threshold_den
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("dfc"))
    from pyspark.sql import Window

    w_doc = Window.partitionBy(id_col).orderBy("dfc", "tok")
    ranked = (
        toks.join(df, "tok")
        .withColumn("rn", F.row_number().over(w_doc))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    # prefix length = sz - ceil(t*sz) + 1, integer ceil
    pref = ranked.filter(
        F.col("rn")
        <= F.col("sz") - ((tn * F.col("sz") + (td - 1)) / td).cast("bigint") + 1
    ).select(F.col(id_col), "tok", "sz")
    a = pref.select(
        F.col(id_col).alias("da"), F.col("tok"), F.col("sz").alias("sa")
    )
    b = pref.select(
        F.col(id_col).alias("db"), F.col("tok"), F.col("sz").alias("sb")
    )
    return (
        a.join(b, "tok")
        .filter(
            (F.col("da") < F.col("db"))
            # size filter: t*|A| <= |B| and t*|B| <= |A|
            & (td * F.col("sb") >= tn * F.col("sa"))
            & (td * F.col("sa") >= tn * F.col("sb"))
        )
        .select("da", "db")
        .distinct()
    )


def containment_join(
    toks: DataFrame,
    threshold_num: int = 9,
    threshold_den: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """DIRECTED near-superset pairs: (sub_doc, sup_doc, n_inter, n_sub)
    for every ordered pair with containment ``|A∩B| / |A| >= t`` (A =
    sub's shingle set) — the ASYMMETRIC cousin of the Jaccard join that
    Jaccard structurally misses: a short doc fully embedded in a long
    one has tiny Jaccard (|A|/|B|) but containment 1.0. This is the
    near-superset mode of training-corpus dedup (doc B extends doc A —
    boilerplate-wrapped re-posts, quote-with-commentary, version
    supersets); keep the superset, drop the subset.

    Prefix filtering adapts one-sidedly: only the SUB side is
    prefixed — if ``|A∩B| >= ceil(t·|A|)`` then A misses at most
    ``|A| - ceil(t·|A|)`` of its tokens from B, so among A's first
    ``|A| - ceil(t·|A|) + 1`` tokens (global rarest-first order) at
    least one is in B (pigeonhole; B's order is irrelevant because B
    is indexed in FULL). The sup side has no prefix — but candidates
    only join on SUB-prefix tokens, which are each sub's RAREST, so
    the postings join stays self-deskewing. One-sided size prune:
    ``|B| >= ceil(t·|A|)`` (the intersection can't exceed |B|).
    Verify is the exact integer test ``td·|A∩B| >= tn·|A|`` over
    per-doc sorted arrays (the prefix_filter_join verify posture)."""
    tn, td = threshold_num, threshold_den
    dfc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("dfc"))
    from pyspark.sql import Window

    w_doc = Window.partitionBy(id_col).orderBy("dfc", "tok")
    ranked = (
        toks.join(dfc, "tok")
        .withColumn("rn", F.row_number().over(w_doc))
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    pref = ranked.filter(
        F.col("rn")
        <= F.col("sz") - ((tn * F.col("sz") + (td - 1)) / td).cast("bigint") + 1
    ).select(F.col(id_col).alias("da"), "tok", F.col("sz").alias("sa"))
    arrs = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("sz"),
    )
    b = toks.select(F.col(id_col).alias("db"), "tok")
    cand = (
        pref.join(b, "tok")
        .filter(F.col("da") != F.col("db"))
        .select("da", "db", "sa")
        .distinct()
    )
    return (
        cand.join(
            arrs.select(F.col(id_col).alias("da"), F.col("arr").alias("__aa")),
            "da",
        )
        .join(
            arrs.select(
                F.col(id_col).alias("db"),
                F.col("arr").alias("__ab"),
                F.col("sz").alias("sb"),
            ),
            "db",
        )
        # one-sided size prune folded into the verify scan
        .filter(td * F.col("sb") >= tn * F.col("sa"))
        .withColumn(
            "n_inter", F.size(F.array_intersect("__aa", "__ab")).cast("bigint")
        )
        .filter(td * F.col("n_inter") >= tn * F.col("sa"))
        .select(
            F.col("da").alias("sub_doc"),
            F.col("db").alias("sup_doc"),
            "n_inter",
            F.col("sa").alias("n_sub"),
        )
        .orderBy("sub_doc", "sup_doc")
    )


def prefix_filter_join(
    toks: DataFrame,
    threshold_num: int = 6,
    threshold_den: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (a < b) with Jaccard >= num/den over (id, tok) sets.
    Output: (doc_a, doc_b, n_inter, n_union) — exact BIGINTs."""
    tn, td = threshold_num, threshold_den
    cand = prefix_candidates(toks, tn, td, id_col)
    # Verify step the way PPJoin itself does: per-candidate IN-MEMORY set
    # intersection, not a relational re-join. Each document's shingle set
    # is collected once into a sorted array (doc-count rows); candidates
    # join the two arrays and ``array_intersect`` computes the overlap as
    # a codegen expression. The join-explode alternative (candidate ×
    # every token of its left doc, then re-join the right side) measured
    # ~1.6× the ENTIRE query's wall clock at sf0.1 — 300k candidates ×
    # ~130 tokens is 40M shuffled rows vs 300k array ops.
    arrs = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("sz"),
    )
    return (
        cand.join(
            arrs.select(
                F.col(id_col).alias("da"),
                F.col("arr").alias("__aa"),
                F.col("sz").alias("sa"),
            ),
            "da",
        )
        .join(
            arrs.select(
                F.col(id_col).alias("db"),
                F.col("arr").alias("__ab"),
                F.col("sz").alias("sb"),
            ),
            "db",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("__aa", "__ab")).cast("bigint")
        )
        .filter(
            td * F.col("n_inter")
            >= tn * (F.col("sa") + F.col("sb") - F.col("n_inter"))
        )
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_inter",
            (F.col("sa") + F.col("sb") - F.col("n_inter")).alias("n_union"),
        )
        .orderBy("doc_a", "doc_b")
    )
