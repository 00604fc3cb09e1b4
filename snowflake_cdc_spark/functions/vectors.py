"""Vector math over ``array<float/double>`` columns (SURVEY.md §2.8 N3).

Built on higher-order functions (``zip_with`` / ``transform`` /
``aggregate``) — evaluated JVM-side per row, no Python boundary, no
shuffle. Elements are cast to double *before* multiplication so Spark and
the DuckDB oracle accumulate identical IEEE-754 values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def round_half_up(col: Column, scale: int) -> Column:
    """Tie-robust canonical rounding for TRUE-ratio doubles (round-3
    determinism amendment, COVERAGE.md): ``floor(x * 10^s + 0.5) / 10^s``
    — every step is plain IEEE double arithmetic, so Spark and any SQL
    oracle computing the token-identical expression produce bit-identical
    results even at representation-boundary ties. Engine-native ROUND is
    NOT portable there: Spark rounds the shortest decimal representation
    (BigDecimal.valueOf, HALF_UP) while e.g. DuckDB scales the raw binary
    double and std::round()s it. Non-negative inputs only (half-up via
    +0.5/floor)."""
    factor = F.lit(float(10 ** scale))
    return F.floor(col * factor + F.lit(0.5)) / factor
