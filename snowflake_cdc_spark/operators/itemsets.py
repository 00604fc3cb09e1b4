"""Frequent itemset mining — pair co-occurrence with A-PRIORI pruning
(Agrawal/Srikant 1994), the market-basket staple ("parts bought
together >= s times").

Scale shape: the pair expansion is the danger — a basket with b items
yields C(b,2) candidate pairs, and the corpus-wide join cost is
Σ_basket b². A-priori's downward-closure property (a frequent pair's
items are each frequent) lets the expansion run over FREQUENT items
only: one item-support aggregation, a semi-join pruning every
infrequent item from every basket BEFORE the self-join, then the
per-basket pair join + count + support filter. On a long-tail catalog
the prune removes most of each basket (planted test: a basket of
one-off items generates ZERO candidates). Everything is exact integer
counts over distinct (basket, item) pairs — fully hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    baskets: DataFrame,
    min_support: int = 2,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """(item_a, item_b, support): unordered item pairs co-occurring in
    at least ``min_support`` baskets. Input rows are (basket, item);
    duplicates are collapsed (set semantics per basket)."""
    li = baskets.select(basket_col, item_col).distinct()
    freq = (
        li.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= min_support)
        .select(item_col)
    )
    # downward closure: prune infrequent items from every basket BEFORE
    # the quadratic per-basket expansion
    fl = li.join(freq, item_col, "left_semi")
    a = fl.select(F.col(basket_col).alias("__bk"), F.col(item_col).alias("item_a"))
    b = fl.select(F.col(basket_col).alias("__bk"), F.col(item_col).alias("item_b"))
    return (
        a.join(b, "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy("item_a", "item_b")
    )
