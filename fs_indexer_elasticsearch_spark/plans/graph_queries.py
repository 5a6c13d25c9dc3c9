"""Graph-structure analytics over the MinHash near-dup graph.

The dedup layer emits an undirected candidate-pair graph
(`operators/dedup.py` minhash_lsh_pairs); connected components and
PageRank already consume it. This module adds the third classic
distributed-graph primitive a curation pipeline leans on:

- ``graph_triangle_count``: per-node triangle participation (plus
  degree), i.e. how CLIQUE-LIKE each near-dup neighborhood is. A node
  in many triangles sits inside a mutually-similar cluster (a true
  duplicate pile — safe to collapse to one exemplar); a high-degree
  node with few triangles is a hub of pairwise-only similarity
  (template/boilerplate contamination — collapsing it would delete
  distinct documents). The triangle/degree split is the standard
  signal for that decision (local clustering coefficient numerator).

Scale shape: the canonical-edge list (a < b) makes every triangle
countable exactly once via two equi-joins — edges(a,b) ⋈ edges(b,c)
produces open wedges anchored at their middle vertex, and the second
join closes them against edges(a,c). Cost is O(Σ deg(v)²) wedge rows,
the same bound every production triangle counter (Cohen's MapReduce
algorithm, GraphX's triangleCount) pays; no step is quadratic in
|V| and nothing leaves the executors. At 100 TB the wedge join keys
(b, then (a,c)) are hash-shuffled — skew from a super-hub would be
handled by the same degree-ordered orientation this plan already
uses: orienting every edge low-id→high-id caps each wedge list at
the out-degree, the classic mitigation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import ckpt_shared

from ..operators.dedup import minhash_lsh_pairs
from .llm_queries import _aug_corpus
from .registry import ORACLES, query, stable_round


def _triangle_oracle() -> str:
    pairs = ORACLES["dedup_minhash_lsh"]
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({pairs})),
    e AS (
        SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
        FROM pairs
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    members AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ),
    tcount AS (
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM members GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node
    )
    SELECT t.node, d.degree, t.n_triangles
    FROM tcount t JOIN deg d ON d.node = t.node
    ORDER BY t.n_triangles DESC, t.node
    LIMIT 10
    """


def _jaccard_oracle() -> str:
    pairs = ORACLES["dedup_minhash_lsh"]
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({pairs})),
    e AS (
        SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
        FROM pairs
    ),
    sym AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
    ),
    deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
    common AS (
        SELECT s1.u AS x, s2.u AS y, CAST(count(*) AS BIGINT) AS n_common
        FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        GROUP BY s1.u, s2.u
    ),
    direct AS (SELECT a AS x, b AS y, 1 AS linked FROM e)
    SELECT x, y, n_common,
           round(n_common::DOUBLE
                 / (dx.deg + dy.deg - n_common) + 1e-7, 4) AS jaccard
    FROM common
    LEFT JOIN direct USING (x, y)
    JOIN deg dx ON dx.u = x
    JOIN deg dy ON dy.u = y
    WHERE linked IS NULL
    ORDER BY jaccard DESC, x, y
    LIMIT 10
    """


@query("graph_link_prediction_jaccard", oracle=_jaccard_oracle())
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the near-dup graph: the top-10 UNLINKED
    node pairs by neighborhood Jaccard (|N(u)∩N(v)| / |N(u)∪N(v)|) —
    "these two documents share most of their near-duplicates but were
    never emitted as a candidate pair themselves", the standard
    second-pass recall repair for LSH's probabilistic misses (a pair
    whose bands all collided elsewhere still surfaces through shared
    neighbors).

    Plan: common-neighbor counts are one self-equi-join of the
    symmetrized edge list on the shared neighbor (the same O(Σ deg²)
    wedge frame as triangle counting, grouped on the outer pair
    instead of closed against a third edge), union sizes come from the
    degree table via inclusion-exclusion, and already-linked pairs
    drop with one anti-join against the canonical edges. Everything is
    keyed; nothing is quadratic in |V|."""
    pairs = minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    )
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .distinct()
        .transform(ckpt_shared)
    )
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    s1 = sym.select(F.col("u").alias("x"), "v")
    s2 = sym.select(F.col("u").alias("y"), "v")
    common = (
        s1.join(s2, "v")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    unlinked = common.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    dx = deg.select(F.col("u").alias("x"), F.col("deg").alias("_dx"))
    dy = deg.select(F.col("u").alias("y"), F.col("deg").alias("_dy"))
    return (
        unlinked.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "n_common",
            stable_round(
                F.col("n_common").cast("double")
                / (F.col("_dx") + F.col("_dy") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "x", "y")
        .limit(10)
    )


_LPA_ROUNDS = 4


def label_propagation(sym: DataFrame, rounds: int) -> DataFrame:
    """Deterministic synchronous LPA over a SYMMETRIZED edge list
    (u, v): every node starts as its own label; each round every node
    simultaneously adopts the most frequent label among its neighbors,
    ties to the smallest label. Returns (node, lab) after ``rounds``
    rounds. Each round = one O(|E|) equi-join on the neighbor id +
    hash-agg count per (node, label) + argmax via min-over-struct
    ((-count, label)) — the same total order as ORDER BY count DESC,
    label."""
    labels = sym.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("lab")
    )
    for _ in range(rounds):
        labels = (
            sym.join(
                labels.select(F.col("node").alias("v"), "lab"), "v"
            )
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("u")
            .agg(F.min(F.struct((-F.col("c")).alias("negc"), F.col("lab"))).alias("best"))
            .select(F.col("u").alias("node"), F.col("best.lab").alias("lab"))
        )
    return labels


def _lpa_oracle() -> str:
    pairs = ORACLES["dedup_minhash_lsh"]
    rounds = []
    for k in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""
    l{k} AS (
        SELECT u AS node, lab FROM (
            SELECT s.u, p.lab,
                   row_number() OVER (PARTITION BY s.u
                                      ORDER BY count(*) DESC, p.lab) AS rn
            FROM sym s JOIN l{k - 1} p ON p.node = s.v
            GROUP BY s.u, p.lab
        ) WHERE rn = 1
    )""")
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({pairs})),
    e AS (
        SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
        FROM pairs
    ),
    sym AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lab FROM sym),
    {",".join(rounds)}
    SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_nodes
    FROM l{_LPA_ROUNDS}
    GROUP BY lab
    ORDER BY n_nodes DESC, community
    LIMIT 10
    """


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by SYNCHRONOUS label
    propagation (Raghavan et al.), 4 fixed rounds: every node starts
    as its own label, then each round simultaneously adopts the most
    frequent label among its neighbors (ties to the smallest label —
    fully deterministic, unlike classical randomized LPA, so the driver
    can hash-compare the result). Communities are FINER than connected
    components: CC merges everything reachable, LPA splits a component
    into its densely-linked cores — the granularity at which a curation
    pipeline picks one exemplar per duplicate pile without collapsing a
    whole template-contaminated component into one document. Returns
    the top-10 communities by size.

    Plan: each round is one equi-join of the symmetrized edge list
    against the previous label frame on the neighbor id, a hash-agg
    count per (node, label), and an argmax via min-over-struct
    ((-count, label) — the same total order as the oracle's ORDER BY
    count DESC, label) — O(|E|) shuffled rows per round, never
    quadratic, labels never leave the executors. The fixed round count
    makes the plan a static 4-stage chain (the oracle unrolls the
    same rounds as CTEs); at 100 TB each round shuffles on the
    neighbor id exactly like the pointer-doubling CC rounds, and the
    label frame it carries is |V| rows, not |E|."""
    pairs = minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    )
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .distinct()
        .transform(ckpt_shared)
    )
    sym = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .transform(ckpt_shared)
    )
    labels = label_propagation(sym, _LPA_ROUNDS)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy(F.col("n_nodes").desc(), "community")
        .limit(10)
    )


@query("graph_triangle_count", oracle=_triangle_oracle())
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nodes of the near-dup graph by exact triangle
    participation, with degree alongside — the clique-vs-hub signal
    described in the module docstring.

    Plan: canonicalize edges low-id→high-id (each triangle a<b<c then
    exists exactly once as the edge triple (a,b),(b,c),(a,c)), build
    wedges with one equi-join on the shared middle vertex, close them
    with a second equi-join on the (low, high) endpoint pair, then
    explode each closed triangle to its three members and hash-count.
    All joins are keyed (no broadcast-NLJ, nothing quadratic in |V|);
    the wedge frame is the textbook O(Σ deg²) intermediate. The edge
    list is lazily checkpointed so the three self-join branches share
    one materialization of the LSH candidate pipeline instead of
    recomputing the shingle→signature→band chain per branch.
    """
    pairs = minhash_lsh_pairs(
        _aug_corpus(spark, sf_dir), "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.5,
    )
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .distinct()
        .transform(ckpt_shared)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tcount = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        tcount.join(deg, "node")
        .select("node", "degree", "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(10)
    )
