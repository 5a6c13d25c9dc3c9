"""Structured Streaming layer: incremental ingest pipeline and
windowed/sessionized event aggregation."""
