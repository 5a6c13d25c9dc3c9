"""Sinks: versioned parquet snapshot store (replaces DuckDB
transactions), ES bulk formatting, DuckDB-file interop."""
