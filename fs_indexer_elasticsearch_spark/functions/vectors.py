"""Vector column expressions for embedding similarity search.

All math is elementwise float→double then a sequential fold — the
DuckDB oracle mirrors it with list lambdas, so dot products are
computed over identical doubles in both engines. Rankings always use
``stable_round``-ed similarities + an id tiebreak so top-k sets can't
flip on last-ulp differences.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length float arrays."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_weight(h: int | Column, d: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]:
    derived from md5(f"{h}:{d}") so every engine regenerates the same
    planes without storing them (no RNG, no broadcast state)."""
    hs = F.lit(f"{h}:") if isinstance(h, int) else F.concat(h.cast("string"), F.lit(":"))
    key = F.concat(hs, d.cast("string"))
    v = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return ((v % 2001) - 1000) / F.lit(1000.0)


def lsh_bucket(vec: Column | str, num_planes: int = 8, table: int = 0) -> Column:
    """Sign-random-projection LSH bucket code (num_planes bits).

    Scale path for ANN: vectors land in 2^num_planes buckets; search
    joins on the bucket key instead of crossing the full corpus.
    ``table`` offsets the hyperplane keys so multiple independent
    tables (the recall-boosting OR-construction) reuse this builder.
    """
    v = _c(vec)
    dims = F.sequence(F.lit(1), F.size(v))

    def plane_bit(h: int) -> Column:
        prods = F.transform(
            dims,
            lambda d: F.element_at(v, d).cast("double")
            * hyperplane_weight(table * 64 + h, d),
        )
        dp = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(dp > 0, F.shiftleft(F.lit(1).cast("long"), h)).otherwise(
            F.lit(0).cast("long")
        )

    code = F.lit(0).cast("long")
    for h in range(num_planes):
        code = code + plane_bit(h)
    return code
