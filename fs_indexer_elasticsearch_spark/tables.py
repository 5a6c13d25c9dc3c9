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


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
