"""Distributed k-means over embedding columns (Lloyd's algorithm).

Scale shape — the textbook Spark pattern:

- Centroids are TINY (k × dim doubles) and live on the driver; each
  Lloyd iteration broadcasts them into the assignment expression as
  literals, so assignment is a pure per-row projection (zero shuffle).
- The centroid update is ONE hash aggregation per iteration
  (``groupBy(cluster)`` with per-dimension averages — map-side partial
  aggregation collapses every partition to ≤ k rows before the
  shuffle), then a k-row collect. At 100 TB the per-iteration cost is
  one scan + one k-row shuffle; nothing grows with corpus size except
  the scan.
- Determinism: initial centroids are the first ``k`` vectors by id
  (no RNG), every per-dimension mean is quantized with
  ``stable_round(·, 6)``, and the argmin orders by
  ``(stable_round(dist, 6), cluster_id)`` — so a DuckDB oracle
  replaying the same unrolled iterations lands on bit-identical
  centroids and assignments (see plans/llm_pipeline3.py).

This powers the SemDeDup-style semantic dedup (cluster-blocked cosine
pairs) the way reference-scope tools run MinHash blocking: cluster ids
replace LSH buckets as the blocking key, reducing the pair space from
O(n²) to O(n²/k) without any all-pairs stage.

Reference scope: the reference engine (fs-indexer-elasticsearch) has
no clustering operator; this extends the corpus-hygiene layer the
assignment asks for beyond reference parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.rounding import stable_round


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def sq_dist_to(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from an array column to a literal centroid.

    A sequential left fold over dimensions — the same evaluation order
    DuckDB's ``list_sum(list_transform(...))`` uses, so both engines
    accumulate in identical order.
    """
    lits = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec, lits, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _assign_cands_sql(
    vec_sql: str, centroids: list[tuple[int, list[float]]]
) -> str:
    """The whole argmin candidate array as ONE Spark-SQL string —
    semantically identical to the Column path in ``assign_clusters``
    (same repr-round-tripped double literals, same fold order, same
    ``round(x + 1e-7, 6)`` boundary shift), but parsed JVM-side in a
    single F.expr instead of k x dim py4j literal calls (the same
    driver-side plan-build pathology measured on lsh_bucket: ~3 s of
    build for 0.1 s of execution on the k-means profile query)."""

    def cand(cid: int, c: list[float]) -> str:
        lits = ",".join(f"{float(x)!r}D" for x in c)
        dist = (
            f"aggregate(zip_with({vec_sql}, array({lits}), "
            "(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
        )
        return (
            f"named_struct('d', round({dist} + {1e-7!r}D, 6), "
            f"'cid', {int(cid)})"
        )

    return (
        "array_min(array("
        + ",".join(cand(cid, c) for cid, c in centroids)
        + "))"
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "v",
) -> DataFrame:
    """Add ``cluster_id`` and rounded ``sq_dist`` columns.

    ``centroids`` is the driver-side list of (cluster_id, vector)
    pairs; they are inlined as literals, so the assignment is a pure
    projection (broadcast-free narrow stage). The argmin compares
    ``(stable_round(dist, 6), cluster_id)`` structs so last-ulp
    distance differences can't flip the choice across engines. The
    column name is backtick-quoted into the single-F.expr fast path
    (``_assign_cands_sql``), so reserved words / non-ASCII names
    resolve as columns exactly like F.col."""
    from ..functions.vectors import quote_ident

    best = F.expr(_assign_cands_sql(quote_ident(vec_col), centroids))
    return df.withColumn("cluster_id", best.getField("cid")).withColumn(
        "sq_dist", best.getField("d")
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 1,
) -> list[tuple[int, list[float]]]:
    """Fit k-means centroids; returns driver-side (cluster_id, vector).

    Initial centroids are the ``k`` rows with the smallest ids (a
    deterministic seed both engines can replay); each iteration is one
    assignment projection + one groupBy centroid update. Per-dimension
    means are ``stable_round``-ed to 6 decimals so the collected
    doubles are bit-identical to an oracle computing the same means.
    Empty clusters drop out (identically on both engines, since
    assignments match).
    """
    base = emb.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    )
    seed = (
        base.orderBy("_id")
        .limit(k)
        .collect()
    )
    if not seed:
        raise ValueError("kmeans_fit: empty input")
    dim = len(seed[0].v)
    centroids = [(i, [float(x) for x in row.v]) for i, row in enumerate(seed)]

    for _ in range(iterations):
        assigned = assign_clusters(base, centroids, "v")
        aggs = [
            stable_round(F.avg(F.element_at(F.col("v"), i + 1)), 6).alias(f"c{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("cluster_id").agg(*aggs).collect()
        centroids = sorted(
            (int(r["cluster_id"]), [float(r[f"c{i}"]) for i in range(dim)])
            for r in rows
        )
    return centroids
