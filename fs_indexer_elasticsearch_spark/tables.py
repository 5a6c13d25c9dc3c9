"""Canonical access to the benchmark/test tables.

TESTDATA.md: ``region nation customer supplier part orders lineitem
events documents embeddings`` parquet files under a scale-factor dir.
"""

from __future__ import annotations

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


def spread_small(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a df whose scan yields far fewer
    partitions than the cluster has cores.

    Heavy per-row work (tokenization, higher-order-function lambdas —
    interpreted, not codegen'd) inherits the SCAN's parallelism; a
    small single-row-group parquet file pins it all to one task. At
    real scale the scan has thousands of row-groups and this is a
    no-op (the partition-count probe plans but does not execute);
    the repartition only fires when the input is so small that the
    shuffle is trivially cheap relative to the serial bottleneck."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
