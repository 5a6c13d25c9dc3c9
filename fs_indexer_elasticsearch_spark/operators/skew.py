"""Skew mitigation utilities.

At 100 TB some keys are pathological (the filesystem root appears in
every row's ancestor list; one customer owns half the orders). Two
standard remedies, both engine-level composable:

 - AQE skew-join splitting is ON by default (session.py) — oversized
   post-shuffle partitions are split automatically. That covers most
   sort-merge joins.
 - ``salted_join`` covers the case AQE can't: a shuffled join where
   one side's hot keys would hammer single tasks even after
   splitting, or when AQE is unavailable (streaming epochs). The hot
   side gets a random-ish salt in [0, factor); the other side is
   replicated across all salt values. Aggregations DON'T need salting
   here: hash aggregation does map-side partial combine, so hot group
   keys reduce before the shuffle.

The salt is derived from a stable hash of a row-unique column (NOT
rand()) so retries/speculative tasks stay deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    *,
    salt_col: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot keys, salted by hashing ``salt_col``)
    against ``other`` (replicated ``factor`` ways). Result columns =
    skewed ∪ other minus the duplicate key.

    ``how`` is restricted to join types whose semantics survive the
    replication: the ``other`` side exists ``factor`` times, so any
    type that EMITS unmatched ``other`` rows (right/full outer) would
    emit ``factor`` null-extended copies of each — wrong row counts.
    Inner/left/semi/anti only consume matches or unmatched SKEWED
    rows (which are salted once), so they are exact."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            f"side would emit {factor} copies of every unmatched row "
            "under right/full outer semantics. Salt the other side "
            "instead, or use a plain join with AQE skew splitting."
        )
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(factor)).cast("int")
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    ).withColumnRenamed(key, "_okey")
    out = s.join(o, (s[key] == o["_okey"]) & (s["_salt"] == o["_salt"]), how)
    return out.drop("_salt", "_okey")
