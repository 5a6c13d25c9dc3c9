"""Ingest sources: find-ls/tab line parsers (pure column expressions),
distributed filesystem walker, YAML config."""
