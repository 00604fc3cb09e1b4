"""Exact-integer logarithm banding (ADVICE r08, q226).

``floor(4 * log2(c))`` computed in floating point sits exactly on a
band boundary whenever ``c`` is a power of two: Spark's ``Log2`` is
``math.log(x)/math.log(2)`` while DuckDB's ``log2`` is ``std::log2``,
so a 1-ulp disagreement at ``c = 2^k`` flips the band and the lane's
hash. Unlike the repo's other float lanes there is NO quantization
tolerance at that boundary, so the band must be integer end to end.

Exact construction for BIGINT ``c >= 1``::

    floor(4*log2(c)) = 4*e + j
      e = bit-length(c) - 1        (MSB position — via the engines'
                                    integer->binary-string conversion:
                                    Spark ``conv(c,10,2)``, DuckDB
                                    ``bin(c)``; both drop leading
                                    zeros, both are pure integer paths)
      j = [c >= T1(e)] + [c >= T2(e)] + [c >= T3(e)]
      Ti(e) = ceil(2^(e + i/4))    (precomputed by exact integer
                                    fourth roots below)

``2^(4e+i)`` is never a perfect fourth power for ``i in 1..3`` (4
does not divide ``4e+i``), so ``Ti = iroot4(2^(4e+i)) + 1`` and the
``>=`` comparisons can never tie — the construction is exact for every
BIGINT, with no floating point anywhere. Both engines index the SAME
literal threshold arrays, so cross-engine parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quarter_log2_band", "quarter_log2_band_sql"]

_MAX_E = 62  # BIGINT: c < 2^63  ->  e <= 62


def _iroot4(n: int) -> int:
    x = int(round(n ** 0.25))
    while x**4 > n:
        x -= 1
    while (x + 1) ** 4 <= n:
        x += 1
    return x


def _thresholds(i: int) -> list[int]:
    return [_iroot4(2 ** (4 * e + i)) + 1 for e in range(_MAX_E + 1)]


_T = {i: _thresholds(i) for i in (1, 2, 3)}


def quarter_log2_band(c) -> Column:
    """Spark Column: exact ``floor(4*log2(c))`` for a BIGINT column
    ``c >= 1`` (quarter-octave frequency band)."""
    col = F.col(c) if isinstance(c, str) else c
    e = (F.length(F.conv(col.cast("bigint"), 10, 2)) - 1).cast("bigint")
    arrs = {i: F.array(*[F.lit(t) for t in _T[i]]) for i in (1, 2, 3)}
    j = sum(
        F.when(col >= F.element_at(arrs[i], (e + 1).cast("int")), 1)
        .otherwise(0)
        .cast("bigint")
        for i in (1, 2, 3)
    )
    return (F.lit(4).cast("bigint") * e + j).cast("bigint")


def quarter_log2_band_sql(expr: str) -> str:
    """DuckDB SQL string computing the same band for BIGINT ``expr``,
    from the SAME threshold literals as the Spark side."""
    lists = {i: "[" + ",".join(str(t) for t in _T[i]) + "]" for i in (1, 2, 3)}
    e = f"(length(bin(CAST({expr} AS BIGINT))) - 1)"
    js = " + ".join(
        f"CAST({expr} >= {lists[i]}[{e} + 1] AS BIGINT)" for i in (1, 2, 3)
    )
    return f"(4 * CAST({e} AS BIGINT) + {js})"
