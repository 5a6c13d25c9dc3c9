"""Semantic dedup via k-means cluster blocking (SemDeDup-style).

The scale story (vs the LSH-bucket path in llm_queries):

- ``kmeans_fit`` (operators/clustering.py) is the textbook Spark
  k-means — centroids are driver-side literals, each Lloyd iteration
  is one narrow assignment projection + ONE hash aggregation whose
  map-side partial collapse makes the shuffle k-row-sized. Nothing
  but the scan grows with corpus size; at 100 TB with k ≈ n/1000 the
  fit cost is `iterations` scans.
- The pair stage self-joins on ``cluster_id`` — the pair space drops
  from O(n²) to Σ|cluster|², and the join shuffles each side once on
  the blocking key (AQE skew-split handles lopsided clusters).
- Determinism (oracle-replayable): seed centroids are the first k
  vectors by id (no RNG), per-dimension means and squared distances
  are ``stable_round``-ed, and the argmin tiebreaks on cluster id —
  so the DuckDB oracle below replays the IDENTICAL unrolled
  iterations and lands on bit-identical assignments.

Reference scope: the reference engine (fs-indexer-elasticsearch) has
no clustering/semantic-dedup operator; this extends the LLM-data
hygiene layer beyond reference parity (SemDeDup: Abbas et al. 2023,
arXiv:2303.09540 — cluster, then dedup within clusters only).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.vectors import cosine
from ..operators.clustering import assign_clusters, kmeans_fit
from ..tables import ckpt_shared, load, spread_small
from .llm_queries import _AUG_CTE_SQL, augmented_embeddings
from .registry import query, stable_round

_K = 8
_ITERATIONS = 2

# --- oracle CTE builders: unrolled Lloyd iterations in DuckDB SQL -----

_SQDIST = """round(list_sum(list_transform(range(1, 65), i ->
        (g.emb[i] - c.cv[i]) * (g.emb[i] - c.cv[i]))) + 1e-7, 6)"""

_SEED_CTE = f"""
    c0 AS (
        SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, emb AS cv
        FROM (SELECT vec_id, emb FROM aug ORDER BY vec_id LIMIT {_K}) s
    )
"""


def _assign_cte(name: str, cents: str) -> str:
    """One assignment pass: nearest centroid by (rounded sq-dist, cid)."""
    return f"""
    {name} AS (
        SELECT vec_id, emb, cid, sqd FROM (
            SELECT g.vec_id, g.emb, c.cid, {_SQDIST} AS sqd,
                   row_number() OVER (
                       PARTITION BY g.vec_id
                       ORDER BY {_SQDIST}, c.cid) AS rn
            FROM aug g, {cents} c
        ) WHERE rn = 1
    )
    """


def _update_cte(name: str, assign: str) -> str:
    """One centroid update: per-dimension rounded means per cluster."""
    return f"""
    {name} AS (
        SELECT cid, list(m ORDER BY d) AS cv FROM (
            SELECT cid, d, round(avg(emb[d]) + 1e-7, 6) AS m
            FROM {assign}, range(1, 65) t(d)
            GROUP BY cid, d
        ) GROUP BY cid
    )
    """


# We only need the `aug` CTE, so compose a WITH chain from the named
# constant (never by string-splitting the composed block): aug, c0,
# a0, c1, a1, c2, af.
_KMEANS_CTES = (
    _AUG_CTE_SQL
    + ",\n"
    + _SEED_CTE
    + ",\n"
    + _assign_cte("a0", "c0")
    + ",\n"
    + _update_cte("c1", "a0")
    + ",\n"
    + _assign_cte("a1", "c1")
    + ",\n"
    + _update_cte("c2", "a1")
    + ",\n"
    + _assign_cte("af", "c2")
)

# Composed from llm_queries' parameterized fragment — ONE cosine/
# rounding recipe across every embedding oracle, so a change to the
# dimension count or epsilon cannot silently drift one module.
from .llm_queries import _COS_PAIR  # noqa: E402

_COS_AB = _COS_PAIR.format(a="a.emb", b="b.emb")


def _fit_and_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit k-means on the augmented embeddings, assign every vector.

    Returns (vec_id, v double[64], cluster_id, sq_dist)."""
    # spread_small (optimization round r14): aug is eager-checkpointed
    # below and every Lloyd iteration + downstream consumer inherits
    # its partitioning — from the 1-task parquet scan, ALL of k-means
    # ran serially on one core. Spread before the checkpoint.
    emb = spread_small(load(spark, sf_dir, "embeddings"))
    # Materialize the augmented fixture before building any assignment
    # expression: the per-dimension perturbation lambdas would otherwise
    # be inlined k times per centroid into every Lloyd plan, blowing up
    # analysis time ~6x. Production reads embeddings as a plain parquet
    # column, which this truncated lineage reproduces; the checkpoint is
    # n x (64 doubles) — the fit's working set, not the corpus text.
    aug = augmented_embeddings(emb).transform(ckpt_shared)
    centroids = kmeans_fit(
        aug, id_col="vec_id", vec_col="emb", k=_K, iterations=_ITERATIONS
    )
    return assign_clusters(
        aug.select("vec_id", F.col("emb").alias("v")), centroids, "v"
    )


@query(
    "semantic_dedup_clusters",
    oracle=_KMEANS_CTES
    + f"""
    SELECT cluster_id, id_a, id_b, cos_sim FROM (
        SELECT a.cid AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
               {_COS_AB} AS cos_sim
        FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.85
    """,
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means cluster ids as
    the blocking key (replacing LSH buckets), exact cosine ≥ 0.85
    verify within clusters only. Pair space O(Σ|cluster|²), never
    all-pairs; the blocking join shuffles on cluster_id once."""
    assigned = _fit_and_assign(spark, sf_dir).select(
        "vec_id", "v", "cluster_id"
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.cluster_id").alias("cluster_id"),
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            stable_round(cosine(F.col("a.v"), F.col("b.v")), 6).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= 0.85)
    )


@query(
    "embedding_outliers",
    oracle=_KMEANS_CTES
    + """
    , stats AS (
        SELECT cid, round(avg(sqd) + 1e-7, 6) AS mu,
               round(stddev_samp(sqd) + 1e-7, 6) AS sd,
               count(*) AS n
        FROM af GROUP BY cid
    )
    SELECT a.vec_id, a.cid AS cluster_id, a.sqd AS sq_dist,
           round((a.sqd - s.mu) / s.sd + 1e-7, 4) AS z
    FROM af a JOIN stats s ON a.cid = s.cid
    WHERE s.n >= 3 AND s.sd > 1e-9
      AND round((a.sqd - s.mu) / s.sd + 1e-7, 4) >= 1.5
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection — the pruning complement to
    SemDeDup: vectors whose distance to their assigned centroid is
    ≥1.5 cluster-stddevs above the cluster mean are flagged (likely
    mislabeled, off-distribution, or garbage docs a curation pass
    drops before training). Cluster stats are a k-row aggregate
    broadcast back onto the assignment projection: one narrow pass +
    one tiny join, nothing grows with corpus size except the scan.
    Degenerate clusters (n<3 or zero spread) are excluded — no z-score
    is defined there. Rounded identically on both engines so the
    threshold cut is bit-stable."""
    assigned = _fit_and_assign(spark, sf_dir)
    stats = assigned.groupBy("cluster_id").agg(
        stable_round(F.avg("sq_dist"), 6).alias("mu"),
        stable_round(F.stddev("sq_dist"), 6).alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    z = stable_round((F.col("sq_dist") - F.col("mu")) / F.col("sd"), 4)
    return (
        assigned.join(F.broadcast(stats), "cluster_id")
        .filter((F.col("n") >= 3) & (F.col("sd") > 1e-9))
        .withColumn("z", z)
        .filter(F.col("z") >= 1.5)
        .select("vec_id", "cluster_id", "sq_dist", "z")
    )


@query(
    "kmeans_cluster_profile",
    oracle=_KMEANS_CTES
    + """
    SELECT cid AS cluster_id, count(*) AS n_vecs,
           round(avg(sqd) + 1e-7, 4) AS avg_sq_dist
    FROM af GROUP BY cid
    """,
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size / dispersion profile of the fitted k-means — the
    monitoring view a semantic-dedup pipeline watches for degenerate
    clustering (one mega-cluster ⇒ blocking stops helping). One hash
    agg over the assignment projection; k-row result."""
    assigned = _fit_and_assign(spark, sf_dir)
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        stable_round(F.avg("sq_dist"), 4).alias("avg_sq_dist"),
    )
