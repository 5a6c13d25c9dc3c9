"""DuckDB-file interop sink/source (S8/S11).

The reference's persistent store is an embedded .duckdb file
(db_duckdb.py:157-268); downstream tools may still expect one. The
Spark-side table of record is the parquet SnapshotStore — this module
materializes a snapshot INTO a DuckDB file (and back) through a
single-partition Arrow handoff, for oracle interop and migration.

Driver-side by design: a .duckdb file is a single-writer embedded DB,
so at scale you export parquet and let DuckDB ATTACH/read it; this
helper is for modest result sets and test fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_duckdb(df: DataFrame, db_path: str, table: str) -> int:
    """Replace ``table`` in the DuckDB file with the DataFrame's rows
    (Arrow handoff). Returns the row count."""
    import duckdb

    adf = df.toArrow()  # Arrow Table via the Spark Arrow collect path
    con = duckdb.connect(db_path)
    try:
        con.register("_incoming", adf)
        con.execute(f'CREATE OR REPLACE TABLE "{table}" AS SELECT * FROM _incoming')
        n = con.execute(f'SELECT count(*) FROM "{table}"').fetchone()[0]
        con.unregister("_incoming")
        return int(n)
    finally:
        con.close()


def read_duckdb(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Load a DuckDB table into a DataFrame (Arrow handoff)."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        adf = con.execute(f'SELECT * FROM "{table}"').arrow()
    finally:
        con.close()
    return spark.createDataFrame(adf.to_pandas())
