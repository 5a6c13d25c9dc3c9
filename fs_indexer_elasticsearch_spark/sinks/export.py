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


def with_shard(df: DataFrame, key: str, n_shards: int, col: str = "shard") -> DataFrame:
    """Deterministic content shard in [0, n_shards): leading 8 hex
    chars of md5(key) mod n_shards. Pure function of the key — stable
    across runs, cluster sizes, and partition layouts (Spark's native
    ``hash`` is stable too, but md5 keeps the assignment reproducible
    from any engine a loader might audit shards with)."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
    return df.withColumn(col, (h.cast("long") % n_shards).cast("int"))


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

    One repartition on the derived shard column co-locates each shard
    in one task; rows are sorted by ``(shard, key)`` within tasks so
    shard files are order-stable; ``maxRecordsPerFile`` bounds any
    single object. With ``partition_by`` the layout is
    ``<path>/<col>=<val>/part-*`` and the shard column is retained as
    a data column for loader-side addressing.
    """
    sharded = with_shard(df, key, n_shards)
    out = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        out = out.partitionBy(partition_by)
    out.parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read an export back; ``shards`` filters to a subset via the
    retained shard column (a data-skipping predicate — parquet
    row-group stats prune non-matching files since each file holds a
    single shard value)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df
