"""Cross-engine-stable rounding (shared by operators and the declared
query layer — lives here so operators never import the plans package,
which would cycle back through the query registry)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def stable_round(col: Column | str, n: int) -> Column:
    """Boundary-shifted rounding for float aggregates.

    Plain ``round(x, n)`` diverges between Spark and DuckDB when the
    value's shortest decimal representation lands exactly on a half
    boundary (Spark rounds the BigDecimal shortest form HALF_UP;
    DuckDB rounds the scaled binary value) — systematic for averages
    of few 2-decimal values and for ``price * 1.1``-style products.
    Adding 1e-7 before rounding shifts those exact-boundary cases off
    the knife edge identically in both engines; every oracle SQL twin
    writes ``round(x + 1e-7, n)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + F.lit(1e-7), n)
