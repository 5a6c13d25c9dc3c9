"""Domain/URL curation operators (r6 verdict #4).

C4/RefinedWeb-style pipelines curate per ORIGIN before anything else:
extract the registrable domain from each document's URL, cap documents
per site (one over-represented host otherwise dominates the mixture),
and drop blocklisted origins. The documents table's ``source`` column
is categorical (``src0..src19``), so the queries first derive a
deterministic URL from (lang, source, doc_id) — identical expression
in both engines, making the parsing/capping/blocking logic itself the
thing the oracle gate verifies.

Scale notes: domain extraction is a pure projection (regexp over one
short column — codegen, no UDF); the per-site cap is one window over a
``host`` hash partition (the exact shape used for per-domain caps at
corpus scale — skew-safe because a single host's rows land in one
partition only if one host dominates, in which case THE CAP ITSELF is
the fix and the window can run over a pre-limited ``rn <= cap`` via
groupBy-topK if a pathological host appears); the blocklist is a
broadcast-literal IN filter pushed into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load
from .registry import query, stable_round

_TLDS = ("com", "org", "biz")

# url = https://<lang>.<source>.example.<tld>/d/<doc_id>, tld chosen by
# the numeric suffix of source — deterministic, engine-portable.
_URL_SQL = f"""
    WITH urls AS (
        SELECT doc_id, lang, source, n_chars,
               'https://' || lang || '.' || source || '.example.' ||
               ['{_TLDS[0]}','{_TLDS[1]}','{_TLDS[2]}'][substr(source, 4)::INT % 3 + 1]
               || '/d/' || doc_id AS url
        FROM documents
    ),
    hosts AS (
        SELECT doc_id, lang, source, n_chars, url,
               regexp_extract(url, '^https?://([^/]+)/', 1) AS host
        FROM urls
    ),
    domains AS (
        SELECT doc_id, lang, source, n_chars, url, host,
               regexp_extract(host, '([a-z0-9-]+\\.[a-z]+)$', 1) AS domain
        FROM hosts
    )
"""


def _with_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tld = F.element_at(
        F.array(*[F.lit(t) for t in _TLDS]),
        (F.substring("source", 4, 8).cast("int") % 3 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"),
        F.col("lang"),
        F.lit("."),
        F.col("source"),
        F.lit(".example."),
        tld,
        F.lit("/d/"),
        F.col("doc_id").cast("string"),
    )
    d = d.select("doc_id", "lang", "source", "n_chars", url.alias("url"))
    d = d.withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/]+)/", 1)
    )
    return d.withColumn(
        "domain", F.regexp_extract("host", r"([a-z0-9-]+\.[a-z]+)$", 1)
    )


@query(
    "domain_extract_counts",
    oracle=_URL_SQL
    + """
    SELECT domain,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM domains GROUP BY domain
    """,
)
def domain_extract_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain extraction + per-domain corpus profile: the
    first question a curation pass asks ("where does my corpus come
    from?"). URL -> host -> registrable domain via portable regexes;
    one groupBy on the (3-value) domain key with map-side combine."""
    return (
        _with_domain(spark, sf_dir)
        .groupBy("domain")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "per_domain_cap",
    oracle=_URL_SQL
    + """
    , ranked AS (
        SELECT doc_id, host, n_chars,
               row_number() OVER (PARTITION BY host
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM domains
    )
    SELECT host,
           CAST(sum(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk <= 5 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           CAST(min(doc_id) AS BIGINT) AS sample_doc
    FROM ranked GROUP BY host
    """,
)
def per_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site document cap (RefinedWeb-style "max N pages per
    domain"): rank each host's docs by quality proxy (n_chars desc,
    doc_id tiebreak) and report kept-vs-dropped at cap 5 per host.
    One row_number window over the host hash partition — the standard
    corpus-scale shape; no global sort anywhere. n_kept counts the
    docs the cap actually KEEPS (rk <= 5), not the host's total — the
    r7 advice fix: the old count(*) mislabeled dropped docs as kept,
    invisibly to the hash gate because the oracle used the identical
    expression."""
    w = Window.partitionBy("host").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        _with_domain(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum((F.col("rk") <= 5).cast("long")).alias("n_kept"),
            F.sum((F.col("rk") > 5).cast("long")).alias("n_dropped"),
            F.min("doc_id").alias("sample_doc"),
        )
    )


_BLOCKLIST = ("src3", "src7", "src13")

# URL canonicalization, applied in order after lower(): strip
# fragment, strip query, https-normalize, strip www., strip trailing
# slash. Shared by the Spark plan and the idempotence property test
# (tests/test_properties.py) so the two can't drift; the oracle SQL
# nests the same five regexp_replace calls textually.
CANON_STEPS = (
    (r"#.*$", ""),
    (r"\?.*$", ""),
    (r"^http://", "https://"),
    (r"^https://www\.", "https://"),
    (r"/+$", ""),
)


@query(
    "domain_blocklist_filter",
    oracle=_URL_SQL
    + f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM domains
    WHERE source NOT IN ('{_BLOCKLIST[0]}', '{_BLOCKLIST[1]}', '{_BLOCKLIST[2]}')
      AND domain NOT LIKE '%.biz'
    GROUP BY lang
    """,
)
def domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin blocklisting: drop explicit bad sources AND an entire
    TLD class (.biz), then profile the surviving corpus per language.
    Both predicates are literal filters Catalyst pushes into the scan
    (broadcast of nothing — an IN over a 3-literal list is a simple
    predicate); the blocklist at production scale becomes a broadcast
    anti-join against a blocklist table, same plan shape as
    anti_join_missing."""
    return (
        _with_domain(spark, sf_dir)
        .filter(~F.col("source").isin(*_BLOCKLIST))
        .filter(~F.col("domain").endswith(".biz"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "url_canonical_dedup",
    oracle="""
    WITH noisy AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 5 = 0 THEN 'http://' ELSE 'https://' END)
               || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
               || 'News.Example.com/story/' || (doc_id % 25)
               || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=rss' ELSE '' END)
               || (CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(lower(url), '#.*$', ''),
                       '\\?.*$', ''),
                     '^http://', 'https://'),
                   '^https://www\\.', 'https://'),
                 '/+$', '') AS canonical_url
        FROM noisy
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc
    FROM canon GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the C4/web-pipeline step that runs
    BEFORE content dedup (a re-crawled page differs only by tracking
    params/scheme/www/fragment noise; deduping on the canonical URL is
    free compared to shingling content). Deterministic noisy URLs are
    derived in-query (scheme flip, www., trailing slash, utm query,
    fragment — each keyed to a doc_id modulus), canonicalized by a
    5-step regexp normalization (lower, strip fragment, strip query,
    https-normalize, strip www., strip trailing slash), then
    hash-grouped. Pure column expressions — one shuffle on the
    canonical key with map-side combine, the cheapest possible dedup
    at 100 TB (same shape as dedup_exact)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.lit("http://")).otherwise(
            F.lit("https://")
        ),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("News.Example.com/story/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&ref=rss")
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#section-2")).otherwise(
            F.lit("")
        ),
    )
    canon = F.lower(url)
    for pat, rep in CANON_STEPS:
        canon = F.regexp_replace(canon, pat, rep)
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )
