"""Data-profiling and sketch operators: column profiles, HLL distinct
counts under an explicit tolerance contract, count-min-sketch heavy
hitters.

The reference's only profiling surface is the stats accumulator family
(SURVEY.md §2.4 A-7, utils/workflow_stats.py:30-48) and ad-hoc
COUNT/SUM/GROUP BY probes (db_duckdb.py:342-356). A 100 TB engine
needs the real thing: one-pass table profiling and sublinear sketches
whose error is MEASURED against an exact oracle, not assumed.

- ``column_profile``: null count / distinct count / min / max for
  every column of ``orders`` in ONE aggregate pass, unpivoted to a
  row per column. Exact distincts here (the gate needs exact values);
  the 100 TB swap is ``approx_count_distinct`` — which is exactly what
  ``approx_distinct_tolerance`` pins below.
- ``approx_distinct_tolerance``: HLL++ distinct user counts per event
  type, hash-gated through a TOLERANCE CONTRACT: the oracle asserts
  the exact count and ``within_tol = TRUE``; the Spark side computes
  the flag from its own HLL estimate. If the sketch ever drifts past
  3× its configured rsd, the flag flips and the hash-compare fails —
  the approximation's error bound is thereby part of the correctness
  gate (same design as length_percentile_band_approx's rank-arithmetic
  oracle).
- ``cms_heavy_hitters``: count-min sketch (4 md5-derived hash rows ×
  256 buckets) over all token occurrences, read back at the exact
  top-20 tokens. The sketch is a 1,024-row aggregate that collapses
  map-side regardless of vocabulary size — the sublinear path for
  heavy-hitter queries where a (token → count) groupBy's key space is
  the problem. Estimates are deterministic (md5 hashes, no RNG), so
  the oracle replicates the sketch bit-for-bit; the CMS guarantee
  (never underestimates) is additionally pinned as a column.

All pure DataFrame plans; no UDFs, no collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.text import TOKS_SQL, tokens
from ..tables import ckpt_shared, load
from .registry import query, stable_round

# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------

# (column, SQL expression rendering min/max as an engine-portable string)
_PROFILE_COLS = [
    ("o_orderkey", None),
    ("o_custkey", None),
    ("o_orderstatus", None),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", None),
]


def _profile_oracle() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        if kind == "money":
            # +1e-7 tie-shift like every other printf pair in the repo:
            # a double landing exactly on a .005 boundary renders
            # half-even in DuckDB but HALF_UP in Java's format_string.
            mn = f"printf('%.2f', min({col}) + 1e-7)"
            mx = f"printf('%.2f', max({col}) + 1e-7)"
        elif kind == "ts":
            mn = f"strftime(min({col}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(max({col}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn, mx = f"min({col})::VARCHAR", f"max({col})::VARCHAR"
        parts.append(
            f"""
            SELECT '{col}' AS column_name,
                   CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   {mn} AS min_value, {mx} AS max_value
            FROM orders
            """
        )
    return " UNION ALL ".join(parts)


@query("column_profile", oracle=_profile_oracle())
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of ``orders``: a row per column with
    null count, exact distinct count, and min/max rendered as strings
    (numbers via plain casts, money via %.2f, timestamps via a fixed
    format — identical renderings in both engines).

    Plan shape: a SINGLE wide aggregate computes every per-column
    statistic (Catalyst plans the multi-distinct via Expand — one
    shuffle, no per-column re-scans), then an in-row inline() unpivots
    the 1-row result. At 100 TB the exact distincts become
    approx_count_distinct — the swap whose error contract
    ``approx_distinct_tolerance`` pins — and the plan shape is
    unchanged.
    """
    o = load(spark, sf_dir, "orders")
    aggs = []
    for col, kind in _PROFILE_COLS:
        if kind == "money":
            mn = F.format_string("%.2f", F.min(col) + F.lit(1e-7))
            mx = F.format_string("%.2f", F.max(col) + F.lit(1e-7))
        elif kind == "ts":
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).cast("long").alias(f"{col}__distinct"),
            mn.alias(f"{col}__min"),
            mx.alias(f"{col}__max"),
        ]
    one = o.agg(*aggs)
    structs = [
        F.struct(
            F.lit(col).alias("column_name"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_value"),
            F.col(f"{col}__max").alias("max_value"),
        )
        for col, _ in _PROFILE_COLS
    ]
    return one.select(F.inline(F.array(*structs)))


# ---------------------------------------------------------------------------
# approx_distinct_tolerance
# ---------------------------------------------------------------------------

# HLL++ relative standard deviation; the gate flags beyond 3σ.
_HLL_RSD = 0.05


@query(
    "approx_distinct_tolerance",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, counted exactly AND by HLL++
    (rsd=0.05), gated through a tolerance contract: the oracle asserts
    ``within_tol = TRUE`` at 3× the configured rsd, and the Spark side
    derives the flag from its own sketch. A sketch estimate drifting
    past 15% flips the flag and fails the hash gate — the approximation
    error is part of correctness, not a docstring claim.

    Why it matters at 100 TB: exact count-distinct shuffles the full
    (event_type, user_id) key space; the HLL sketch is a fixed few-KB
    buffer per group that merges map-side. This query is the committed
    evidence that the swap is safe at the configured bound.
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", _HLL_RSD).cast("double")
                - F.count_distinct("user_id").cast("double")
            )
            <= 3 * _HLL_RSD * F.count_distinct("user_id").cast("double")
        ).alias("within_tol"),
    )


# ---------------------------------------------------------------------------
# cms_heavy_hitters
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 20

_TOKS_SQL = TOKS_SQL  # canonical oracle twin of the engine tokenizer


def _cms_bucket_sql(d: str, tok: str) -> str:
    return (
        f"(('0x' || substr(md5('cms' || {d}::VARCHAR || ':' || {tok}), 1, 8))::BIGINT"
        f" % {_CMS_WIDTH})"
    )


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH occ AS (
        SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    cells AS (
        SELECT d, {_cms_bucket_sql("d", "tok")} AS bucket, count(*) AS cnt
        FROM occ, range({_CMS_DEPTH}) r(d)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT tok, count(*) AS exact_cnt FROM occ GROUP BY tok
        ORDER BY exact_cnt DESC, tok LIMIT {_CMS_TOPK}
    ),
    probe AS (
        SELECT tok, exact_cnt, d, {_cms_bucket_sql("d", "tok")} AS bucket
        FROM exact, range({_CMS_DEPTH}) r(d)
    )
    SELECT p.tok AS token,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS est_cnt,
           min(c.cnt) >= p.exact_cnt AS overestimate_ok
    FROM probe p
    JOIN cells c USING (d, bucket)
    GROUP BY p.tok, p.exact_cnt
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over all token occurrences, read back at the
    exact top-20 tokens: estimate = min over the 4 hash rows of the
    hashed bucket's counter. Hashes are md5-derived (deterministic, no
    RNG, no stored state — the same discipline as the LSH planes), so
    the DuckDB oracle rebuilds the identical sketch and the estimates
    hash-compare exactly; the CMS one-sided guarantee (est ≥ exact) is
    pinned as a column.

    Scale shape: the sketch is a {_CMS_DEPTH}×{_CMS_WIDTH}-cell
    aggregate — the explode to (row, bucket) cells collapses in
    map-side partials to ≤1,024 rows no matter the corpus, which is
    the point: heavy-hitter queries without materializing a
    vocabulary-sized (token → count) key space. The exact top-20 here
    exists only to GRADE the sketch (same measure-don't-assume design
    as ann_recall_at_k); a production probe joins the sketch at its
    query tokens.
    """
    from ..tables import spread_small

    # Tokenized occurrences feed BOTH the sketch cells and the exact
    # grading counts: lazy localCheckpoint so the interpreted-lambda
    # tokenize+explode runs once (blocks GC-released, no cross-run
    # block-manager leak), and spread_small so it parallelizes past the small
    # file's single input split (the same recipe as
    # split_contamination_ngrams and shingle_sets).
    occ = (
        spread_small(load(spark, sf_dir, "documents"))
        .select(F.explode(tokens("text")).alias("tok"))
        .transform(ckpt_shared)
    )

    def bucket(d_col: Column, tok_col: Column) -> Column:
        key = F.concat(F.lit("cms"), d_col.cast("string"), F.lit(":"), tok_col)
        return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _CMS_WIDTH

    depths = F.array(*[F.lit(d).cast("long") for d in range(_CMS_DEPTH)])
    cells = (
        occ.select("tok", F.explode(depths).alias("d"))
        .select("d", bucket(F.col("d"), F.col("tok")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("tok"))
        .limit(_CMS_TOPK)
    )
    probe = exact.select(
        "tok", "exact_cnt", F.explode(depths).alias("d")
    ).withColumn("bucket", bucket(F.col("d"), F.col("tok")))
    return (
        F.broadcast(probe)
        .join(cells, ["d", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            F.col("tok").alias("token"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            F.col("est_cnt").cast("long").alias("est_cnt"),
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("overestimate_ok"),
        )
    )
