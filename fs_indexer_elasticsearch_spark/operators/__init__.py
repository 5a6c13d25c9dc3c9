"""Dataflow operators: merge/diff (the reference's upsert semantics),
directory rollup, enrichment, search scoring, and the LLM-data
extensions (dedup, similarity, text analysis, multimodal)."""
