"""Canonical access to the benchmark/test tables.

TESTDATA.md: ``region nation customer supplier part orders lineitem
events documents embeddings`` parquet files under a scale-factor dir.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize ts to TIMESTAMP_NTZ micros (the DuckDB oracle's
        # type) regardless of how the file stores it. Two on-disk
        # encodings exist across testdata generations:
        #  - TIMESTAMP(NANOS) → arrives as int64 ns under
        #    spark.sql.legacy.parquet.nanosAsLong; integer-divide to µs
        #    (ns epochs ~1.7e18 exceed double's 2^53 exact range, so a
        #    float divide would be off by ±1 µs).
        #  - TIMESTAMP(MICROS) → arrives as timestamp/timestamp_ntz
        #    already; at most a cast is needed.
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif not isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def _parse_bytes(s: str) -> int:
    """Parse Spark size-conf strings ('128m', '134217728b', '1g')."""
    s = str(s).strip().lower()
    units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
             "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
    for u in sorted(units, key=len, reverse=True):
        if s.endswith(u):
            return int(float(s[: -len(u)]) * units[u])
    return int(s)


def spread_small(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a df whose scan yields far fewer
    partitions than the cluster has cores.

    Heavy per-row work (tokenization, higher-order-function lambdas —
    interpreted, not codegen'd) inherits the SCAN's parallelism; a
    small single-row-group parquet file pins it all to one task. At
    real scale the scan has thousands of row-groups and this is a
    no-op; the repartition only fires when the input is so small that
    the shuffle is trivially cheap relative to the serial bottleneck.

    The scan-width probe is a CHEAP estimate from the input files'
    on-disk bytes vs maxPartitionBytes (a ``df.rdd.getNumPartitions()``
    probe would pay a full plan-to-RDD conversion on every call); the
    RDD probe remains only as the fallback for in-memory plans with no
    input files. Unstat-able files (object store) → assume wide, no-op.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — plans without a file source
        files = []
    if files:
        from urllib.parse import unquote, urlparse

        sizes = []
        for uri in files:
            try:
                sizes.append(os.path.getsize(unquote(urlparse(uri).path) or uri))
            except OSError:
                return df  # can't stat cheaply (remote store): assume wide
        max_pb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
        # Per-file split estimate: parquet is SPLITTABLE, so one 10 GiB
        # file scans as ~80 tasks, not 1 — min(len(files), total/max_pb)
        # would call that "narrow" and round-robin shuffle a large
        # table, the opposite of this helper's no-op-on-real-scans
        # contract. Sum of per-file ceil(size/max_pb) instead: a single
        # big file counts its splits, a pile of small files counts one
        # task each (Spark packs them, so this over-estimates — which
        # only makes the guard MORE conservative about repartitioning).
        est = sum(max(1, -(-sz // max_pb)) for sz in sizes)
        return df.repartition(target) if est * min_factor <= target else df
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df


#: Shared-subtree materialization policy (r14 verdict #3). Below this
#: many estimated bytes a multi-consumer frame is localCheckpoint-ed
#: (blocks on executors — fast, NOT fault-tolerant: a lost executor
#: kills the query instead of recomputing). Above it, the frame goes
#: to the RELIABLE checkpoint dir when one is configured
#: (``SparkContext.setCheckpointDir`` / spark.graft.checkpoint.dir) or
#: stays UNMATERIALIZED (consumers recompute — at 100 TB, re-deriving
#: a corpus-wide frame beats pinning it on executor storage). The
#: default keeps every bench-SF frame on the local path, so driver
#: bench numbers stay comparable; a cluster deployment lowers it.
CKPT_LOCAL_MAX_BYTES_CONF = "spark.graft.checkpoint.localMaxBytes"
CKPT_LOCAL_MAX_BYTES_DEFAULT = 64 * 1024**3  # 64 GiB

#: Catalyst returns this class of value when a plan's size is unknown
#: (defaultSizeInBytes ~ Long.MaxValue); treat anything this large as
#: "no estimate" rather than "huge".
_SIZE_UNKNOWN = 1 << 62


def ckpt_shared(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize a MULTI-CONSUMER frame once, with a size-gated
    STORAGE policy (r14 verdict #3 — unconditional ``localCheckpoint``
    pins blocks on executors with truncated lineage: fast, but on a
    real cluster a lost executor fails the query, and a corpus-wide
    frame squats on non-fault-tolerant storage):

    - estimated size <= ``spark.graft.checkpoint.localMaxBytes``
      (default 64 GiB), or no reliable checkpoint dir configured:
      ``localCheckpoint(eager=eager)`` — one materialization job,
      every consumer reads blocks. Eager by default because lazy
      checkpoints RACE under parallel consumers inside one action
      (the r14 measured failure mode).
    - above the threshold AND ``SparkContext.setCheckpointDir`` is
      configured: ``checkpoint(eager=eager)`` — the same
      materialization on fault-tolerant storage.

    The gate picks WHERE to materialize, never WHETHER: every path
    returns a checkpointed frame. (The first r15 iteration returned
    over-threshold frames UNCHANGED when no reliable dir existed —
    plan-verified catastrophic: Catalyst's optimizer stats multiply
    join-output estimates, so KB-sized maintenance frames read as
    "over 64 GiB" and silently lost their checkpoint; the hc quantile
    serve's plan went from 4 parquet scans to 126. Estimates this
    loose can route between storage tiers, but must never decide to
    skip materialization.) Row-level semantics identical on every
    path."""
    spark = df.sparkSession
    sc = spark.sparkContext
    if not sc._jsc.sc().getCheckpointDir().isDefined():
        return df.localCheckpoint(eager=eager)
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats are best-effort
        est = _SIZE_UNKNOWN
    limit = int(
        spark.conf.get(
            CKPT_LOCAL_MAX_BYTES_CONF, str(CKPT_LOCAL_MAX_BYTES_DEFAULT)
        )
    )
    if est < _SIZE_UNKNOWN and est > limit:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
