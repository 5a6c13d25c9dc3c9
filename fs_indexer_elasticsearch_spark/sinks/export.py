"""Training-data export sink: deterministic sharded parquet writer.

The writer side of the plans.llm_pipeline6 layer — after packing and
curriculum analysis, the corpus ships to the trainer as a directory of
parquet shards the data loader can open independently. The properties
a loader depends on, and how each maps to a Spark mechanism:

- **Deterministic shard membership**: a row's shard is a pure function
  of its key (``md5`` prefix — the same assignment the
  ``shard_balance_audit`` query audits), never of partition layout or
  task scheduling. ``repartition(n, shard)`` then routes each shard to
  exactly one task.
- **Deterministic within-shard order**: ``sortWithinPartitions`` on
  the key column, so re-running the export writes byte-stable shards
  (modulo parquet metadata) and a loader resuming mid-shard sees a
  stable sequence.
- **Bounded file size**: ``spark.sql.files.maxRecordsPerFile`` caps
  rows per physical file, so a hot shard splits into part files
  instead of producing a multi-GB straggler object. The cap is set on
  the writer, not the session, so it can't leak into other jobs.
- **Optional hive layout**: ``partitionBy`` (e.g. ``lang``) for
  mixture-weighted loaders that sample languages at different rates —
  partition pruning then serves a per-language read without touching
  other languages' bytes.

At 100 TB this is one shuffle (the repartition) and an embarrassingly
parallel write; there is no driver-side row handling anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import md5_shard


def with_shard(df: DataFrame, key: str, n_shards: int, col: str = "shard") -> DataFrame:
    """Deterministic content shard in [0, n_shards): the canonical
    ``functions.hashing.md5_shard`` assignment (first 32-bit word of
    md5(key), i.e. the leading 8 hex chars, mod n — matching
    ``md5_shard`` / ``md5_shard_sql`` exactly; a loader auditing
    shards should recompute that word, not the first byte).
    Pure function of the key — stable across runs, cluster sizes, and
    partition layouts (Spark's native ``hash`` is stable too, but md5
    keeps the assignment reproducible from any engine a loader might
    audit shards with), and IDENTICAL to the assignment the
    ``shard_balance_audit`` query audits — one shared function, so
    sink and audit cannot drift."""
    return df.withColumn(col, md5_shard(F.col(key), n_shards).cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key: str,
    n_shards: int,
    max_records_per_file: int = 1_000_000,
    partition_by: str | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` deterministic parquet shards.

    Every shard is its own hive directory: ``<path>/shard=<i>/part-*``
    (``<path>/<col>=<val>/shard=<i>/part-*`` with ``partition_by``),
    written via dynamic partitioning — so EVERY file belongs to
    exactly one shard by construction, whatever task it was written
    from. This is deliberate: ``repartition(n, "shard")`` alone does
    NOT give one shard per task — Spark hash-partitions the shard
    VALUE through murmur3, which collides shard ids into shared tasks
    and leaves others empty, so files would mix shards (round-6
    review finding). The repartition is kept only to bound task count
    and co-locate each shard's rows; correctness of the layout comes
    from ``partitionBy``.

    Rows are sorted by ``key`` within tasks so shard files are
    order-stable; ``maxRecordsPerFile`` bounds any single object. The
    shard column returns as a partition column on read, so
    shard-subset reads are directory pruning, never a scan.
    """
    sharded = with_shard(df, key, n_shards)
    cols = [partition_by, "shard"] if partition_by else ["shard"]
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*cols)
        .parquet(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read an export back; ``shards`` filters to a subset via the
    shard partition column — pure directory pruning (the scan never
    opens non-matching shard directories)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df
