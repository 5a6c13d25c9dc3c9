"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference filesystem-indexing pipeline
(dmcp718/fs-indexer-elasticsearch), re-expressed Spark-first.

Layout:
  session    — SparkSession factory (UTC, AQE, Arrow)
  tables     — test/bench table loaders
  schema     — canonical fs_entries / direct_links StructTypes
  functions/ — scalar column-expression library (no UDFs in hot paths)
  sources/   — find-ls parsers, filesystem enumerator, config
  operators/ — merge/diff, rollup, enrichment, search, dedup, similarity
  sinks/     — snapshot store, ES bulk formatting, DuckDB file interop
  plans/     — the declared query library + DuckDB oracle SQL
  streaming/ — incremental pipeline, windowed/sessionized aggregations
"""

__version__ = "0.1.0"
