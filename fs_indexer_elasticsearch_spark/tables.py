"""Canonical access to the benchmark/test tables.

TESTDATA.md: ``region nation customer supplier part orders lineitem
events documents embeddings`` parquet files under a scale-factor dir.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
        # ts is TIMESTAMP(NANOS) in the file → int64 ns under
        # spark.sql.legacy.parquet.nanosAsLong. Convert to NTZ micros
        # (matches the DuckDB oracle, which truncates ns → µs).
        # Integer division: ns epochs (~1.7e18) exceed double's 2^53
        # exact-integer range, so a float divide would be off by ±1 µs.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
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
