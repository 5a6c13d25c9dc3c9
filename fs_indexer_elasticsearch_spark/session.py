"""SparkSession factory tuned for the engine.

Replaces the reference's DuckDB connection management
(``fs_indexer_elasticsearch/database/db_duckdb.py:45-141`` — threads,
memory_limit, temp spill, Arrow extension) with the Spark equivalents:
AQE, shuffle-partition sizing, Arrow-accelerated Python interchange and
a pinned UTC session timezone (the reference stores TIMESTAMP WITH TIME
ZONE in UTC, ``db_duckdb.py:230-233``).

All settings are chosen to survive a 100 TB / 1000-executor deployment:
 - AQE on (runtime coalescing, skew-join splitting) so the same code
   runs at sf0.001 and at cluster scale without re-tuning.
 - shuffle partitions default to cores locally; on a real cluster this
   is overridden by ``spark.sql.adaptive.coalescePartitions`` anyway.
 - maxPartitionBytes left at 128m (parquet scan granularity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "fs-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Deterministic-by-default: UTC session timezone, ANSI off (the
    reference's DuckDB SQL is non-ANSI permissive), Arrow enabled for
    every pandas/Python interchange path.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{DEFAULT_CPUS}]")
    shuffle = shuffle_partitions or DEFAULT_CPUS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 defaults ANSI ON; the docstring's promise must be
        # explicit or division-by-zero / overflow RAISE where the
        # permissive DuckDB oracle returns Inf/NULL — a crash-vs-rows
        # divergence on any corpus with a zero denominator (round-6
        # review: the conf was documented but never set).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # The TPC-H-ish parquet was written with naive timestamps; read
        # them as NTZ so Spark values bit-match the DuckDB oracle.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as raw int64 ns and convert in the loader
        # (tables.load) — stays distributed, keeps column pruning.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
