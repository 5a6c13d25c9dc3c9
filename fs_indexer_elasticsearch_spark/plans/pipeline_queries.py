"""Pipeline-semantics queries: the reference's signature operators
(upsert, snapshot diff, directory rollup, glob skip, relevance search,
ES-doc projection) declared over the driver's tables so the DuckDB
oracle can check them (SURVEY §2.2/§2.5/§2.9).

Filesystem entries are synthesized deterministically from
region→nation→customer (a 3-level tree) so the same rows exist in
both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import ancestors, format_size, skip_filter
from ..operators.merge import snapshot_diff, upsert_newer_wins
from ..operators.rollup import directory_rollup
from ..tables import load
from .registry import query, stable_round

# Shared CTE: the synthetic file tree (customer rows are files under
# /region/nation/, nation rows are the directories).
_ENTRIES_SQL = """
    WITH entries AS (
        SELECT '/' || r_name || '/' || n_name || '/' || c_name AS filepath,
               'file' AS type,
               CAST(round(c_acctbal * 100) AS BIGINT) AS size_bytes
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        UNION ALL
        SELECT '/' || r_name || '/' || n_name, 'directory', NULL
        FROM nation JOIN region ON n_regionkey = r_regionkey
    )
"""


def _fs_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _ENTRIES_SQL."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    files = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.concat(
                F.lit("/"), "r_name", F.lit("/"), "n_name", F.lit("/"), "c_name"
            ).alias("filepath"),
            F.lit("file").alias("type"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("size_bytes"),
        )
    )
    dirs = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.concat(F.lit("/"), "r_name", F.lit("/"), "n_name").alias("filepath"),
            F.lit("directory").alias("type"),
            F.lit(None).cast("long").alias("size_bytes"),
        )
    )
    return files.unionByName(dirs)


@query(
    "rollup_directory_sizes",
    oracle=_ENTRIES_SQL
    + """
    , exploded AS (
        SELECT unnest(list_transform(
                   range(1, len(parts)),
                   i -> '/' || array_to_string(parts[1:i], '/')
               )) AS directory,
               CASE WHEN type = 'file' THEN coalesce(size_bytes, 0) ELSE 0 END AS sz,
               CASE WHEN type = 'file' THEN 1 ELSE 0 END AS f,
               CASE WHEN type = 'directory' THEN 1 ELSE 0 END AS d
        FROM (
            SELECT filepath, type, size_bytes,
                   list_filter(string_split(filepath, '/'), x -> x <> '') AS parts
            FROM entries
        )
    )
    SELECT directory,
           CAST(sum(sz) AS BIGINT) AS total_size,
           CAST(sum(f) AS BIGINT) AS file_count,
           CAST(sum(d) AS BIGINT) AS dir_count
    FROM exploded GROUP BY directory
    """,
)
def rollup_directory_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 replacement: recursive directory totals via explode(ancestors)
    + hash agg — linear where the reference's prefix-LIKE theta join
    (elasticsearch_integration.py:325-348) is quadratic."""
    return directory_rollup(_fs_entries(spark, sf_dir))


@query(
    "skip_pattern_filter",
    oracle=_ENTRIES_SQL
    + """
    SELECT filepath, type
    FROM (
        SELECT filepath, type,
               list_filter(string_split(filepath, '/'), x -> x <> '') AS parts
        FROM entries
    )
    WHERE NOT (
        filepath = 'NATION_7'
        OR len(list_filter(parts, x -> x = 'NATION_7' OR x LIKE '%MIDDLE%')) > 0
    )
    """,
)
def skip_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P3 — glob skip-pattern filter compiled to one JVM-side regex
    over the path and its components (scanner.py:71-97)."""
    e = _fs_entries(spark, sf_dir)
    return e.filter(skip_filter(F.col("filepath"), ["NATION_7", "*MIDDLE*"])).select(
        "filepath", "type"
    )


@query(
    "project_derived_columns",
    oracle=_ENTRIES_SQL
    + """
    SELECT filepath,
           list_filter(string_split(filepath, '/'), x -> x <> '')[-1] AS name,
           CASE
               WHEN size_bytes IS NULL THEN NULL
               WHEN size_bytes < 1024 THEN printf('%.1f', size_bytes / 1.0 + 1e-7) || ' B'
               WHEN size_bytes < 1048576 THEN printf('%.1f', size_bytes / 1024.0 + 1e-7) || ' KB'
               WHEN size_bytes < 1073741824 THEN printf('%.1f', size_bytes / 1048576.0 + 1e-7) || ' MB'
               ELSE printf('%.1f', size_bytes / 1073741824.0 + 1e-7) || ' GB'
           END AS size_h,
           len(list_filter(string_split(filepath, '/'), x -> x <> '')) AS depth
    FROM entries WHERE type = 'file' AND size_bytes >= 0
    """,
)
def project_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — derived-column projection: basename, human-readable size,
    path depth (scanner.py:166-198, utils/size_formatter.py:1-25)."""
    from ..functions import basename, path_depth

    e = _fs_entries(spark, sf_dir)
    return (
        e.filter((F.col("type") == "file") & (F.col("size_bytes") >= 0))
        .select(
            "filepath",
            basename("filepath").alias("name"),
            format_size("size_bytes").alias("size_h"),
            path_depth("filepath").cast("long").alias("depth"),
        )
    )


@query(
    "merge_upsert_newer_wins",
    oracle="""
    WITH cur AS (
        SELECT o_orderkey AS k, o_orderdate AS version,
               round(o_totalprice + 1e-7, 2) AS price
        FROM orders
    ),
    bat AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 4 = 0
                    THEN o_orderdate + INTERVAL 365 DAY
                    ELSE o_orderdate - INTERVAL 365 DAY END AS version,
               round(o_totalprice * 1.1 + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000000, o_orderdate, round(o_totalprice + 1e-7, 2)
        FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT coalesce(c.k, b.k) AS k,
           CASE WHEN b.k IS NOT NULL AND (c.k IS NULL OR b.version > c.version)
                THEN b.version ELSE c.version END AS version,
           CASE WHEN b.k IS NOT NULL AND (c.k IS NULL OR b.version > c.version)
                THEN b.price ELSE c.price END AS price
    FROM cur c FULL OUTER JOIN bat b ON c.k = b.k
    """,
)
def merge_upsert_newer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — the reference's ON CONFLICT DO UPDATE ... WHERE
    excluded.modified_time > files.modified_time (scanner.py:225-244)
    as a full-outer snapshot merge. The batch mixes newer rows
    (updated), older rows (kept), and unseen keys (inserted).

    ``delta_batch=False``: this query's batch is ~70% of the table BY
    CONSTRUCTION (every even key + every fifth), so the shuffle_hash
    hint's precondition (delta-sized build side; SHJ builds don't
    spill) does not hold — table-vs-table takes the spill-safe
    sort-merge plan, exactly as the operator's contract directs. The
    delta-shaped SHJ path is exercised where the precondition is real:
    SnapshotStore.merge inside the pipeline/bench ingest cycles."""
    o = load(spark, sf_dir, "orders")
    cur = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("version"),
        stable_round("o_totalprice", 2).alias("price"),
    )
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.col("o_orderdate") + F.expr("INTERVAL 365 DAY"),
        )
        .otherwise(F.col("o_orderdate") - F.expr("INTERVAL 365 DAY"))
        .alias("version"),
        stable_round(F.col("o_totalprice") * 1.1, 2).alias("price"),
    )
    inserts = o.filter(F.col("o_orderkey") % 5 == 0).select(
        (F.col("o_orderkey") + 1_000_000_000_000).alias("k"),
        F.col("o_orderdate").alias("version"),
        stable_round("o_totalprice", 2).alias("price"),
    )
    return upsert_newer_wins(
        cur,
        updates.unionByName(inserts),
        key="k",
        version_col="version",
        delta_batch=False,
    )


@query(
    "snapshot_diff_changes",
    oracle="""
    WITH prev AS (
        SELECT o_orderkey AS k, round(o_totalprice + 1e-7, 2) AS price
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    cur AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice * 2 + 1e-7, 2)
                    ELSE round(o_totalprice + 1e-7, 2) END AS price
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT coalesce(p.k, c.k) AS k,
           CASE WHEN p.k IS NULL THEN 'added'
                WHEN c.k IS NULL THEN 'removed'
                WHEN p.price IS DISTINCT FROM c.price THEN 'changed'
           END AS change
    FROM prev p FULL OUTER JOIN cur c ON p.k = c.k
    WHERE CASE WHEN p.k IS NULL THEN 'added'
               WHEN c.k IS NULL THEN 'removed'
               WHEN p.price IS DISTINCT FROM c.price THEN 'changed'
          END IS NOT NULL
    """,
)
def snapshot_diff_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J5 + the last_seen watermark pass (main.py:339-362,
    scanner.py:414-463) unified: added/removed/changed in ONE
    full-outer join, uncapped (fixes the ES 10k-scroll bug)."""
    o = load(spark, sf_dir, "orders")
    prev = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), stable_round("o_totalprice", 2).alias("price")
    )
    cur = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, stable_round(F.col("o_totalprice") * 2, 2))
        .otherwise(stable_round("o_totalprice", 2))
        .alias("price"),
    )
    return snapshot_diff(prev, cur, key="k", compare_cols=["price"])


@query(
    "search_multi_match",
    oracle="""
    SELECT doc_id,
           3.0 * ((length(text) - length(replace(text, 'spark', ''))) / 5)
         + 1.0 * ((length(text) - length(replace(text, 'join', ''))) / 4) AS score
    FROM documents
    WHERE ((length(text) - length(replace(text, 'spark', ''))) / 5)
        + ((length(text) - length(replace(text, 'join', ''))) / 4) > 0
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def search_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — ES multi_match best_fields with per-field boosts
    (elasticsearch_integration.py:280-289: filepath^2, name^3) as a
    deterministic weighted term-frequency score + top-k."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_spark = (F.length(t) - F.length(F.replace(t, F.lit("spark"), F.lit("")))) / 5
    n_join = (F.length(t) - F.length(F.replace(t, F.lit("join"), F.lit("")))) / 4
    return (
        d.select("doc_id", (3.0 * n_spark + 1.0 * n_join).alias("score"))
        .filter((F.col("score")) > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           count(*) AS n,
           round(sum(value) + 1e-7, 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 json parse (lucidlink_api.py:99) — ``get_json_object``
    path extraction over the events props payload + aggregation (the
    typed ``from_json``-to-struct surface is ``json_struct_surface``
    in relational_ext2.py; this query covers the string-path variant,
    the reference's actual access pattern)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), stable_round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "ancestor_path_search",
    oracle=_ENTRIES_SQL
    + """
    SELECT filepath, type
    FROM (
        SELECT filepath, type,
               list_transform(
                   range(1, len(parts) + 1),
                   i -> '/' || array_to_string(parts[1:i], '/')
               ) AS ancs
        FROM (
            SELECT filepath, type,
                   list_filter(string_split(filepath, '/'), x -> x <> '') AS parts
            FROM entries
        )
    )
    WHERE len(list_filter(ancs, a -> a = '/ASIA')) > 0
    """,
)
def ancestor_path_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 path-hierarchy search — the ES path_hierarchy tokenizer
    (elasticsearch_integration.py:52-63) as an ancestors-array
    containment predicate: find everything under /ASIA."""
    e = _fs_entries(spark, sf_dir)
    return e.filter(
        F.array_contains(ancestors(F.col("filepath"), include_self=True), "/ASIA")
    ).select("filepath", "type")
