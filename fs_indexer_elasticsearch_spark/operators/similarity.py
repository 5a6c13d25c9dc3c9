"""Embedding similarity search.

Two paths:
 - brute-force cosine top-k: broadcast the query set, fold-based dot
   products, per-query window top-k. Exact; cost O(corpus × queries).
 - LSH-bucketed ANN: sign-random-projection bucket codes (derived
   deterministically from md5, no stored planes), equi-join on the
   bucket → only same-bucket candidates are scored. At 100 TB the
   bucket join replaces the cross join; recall is tunable via
   num_planes (fewer planes → bigger buckets) and multi-probe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vectors import cosine, lsh_bucket
from ..plans.registry import stable_round


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim).

    ``queries`` must be small (it is broadcast). Similarities are
    stable_round(6)-ed before ranking with an id tiebreak so the
    selected set is engine-stable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via sign-projection LSH buckets: only
    candidates sharing a bucket with the query (in ANY of the
    ``num_tables`` independent tables — the OR-construction that
    trades candidate volume for recall) are scored. Deterministic
    (hyperplanes derived from md5) → oracle-reproducible."""

    def coded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(F.col(vec_col), num_planes, table=t).alias("code"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(buckets).alias("bk"),
        ).select(out_id, out_vec, "bk.t", "bk.code")

    q = coded(queries, "query_id", "qvec")
    c = coded(corpus, "neighbor_id", "nvec")
    cands = (
        c.join(F.broadcast(q), ["t", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        stable_round(cosine("qvec", "nvec"), 6).alias("cos_sim"),
    )
    return _ranked_topk(scored, k)
