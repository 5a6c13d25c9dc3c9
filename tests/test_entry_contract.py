"""Driver-contract smoke: entry/queries/oracle_sql shape and the
mode-matrix style config loader."""

from __future__ import annotations

import __spark_entry__ as E
from fs_indexer_elasticsearch_spark.sources.config import load_config


def test_entry_contract(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 38
    # Every oracle key has a query; missing-oracle queries are the
    # declared non-SQL-expressible set only.
    assert set(oracles) <= set(qs)


def test_queries_run_at_smallest_sf(spark):
    qs = E.queries()
    # Spot-run a representative from each module family.
    for name in (
        "q01_pricing_summary",
        "rollup_directory_sizes",
        "window_session_30m",
        "dedup_exact",
        "similarity_bruteforce_topk",
    ):
        out = qs[name](spark, "/root/testdata/sf0.001")
        assert out.count() >= 0


def test_config_defaults(tmp_path):
    cfg = load_config(str(tmp_path / "missing.yaml"))
    assert cfg.mode == "elasticsearch"
    assert ".git" in cfg.skip_patterns


def test_config_parses_reference_shape(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
root_path: /mnt/fs
mode: index-only
skip_patterns:
  hidden_files: [".DS_Store"]
  hidden_dirs: [".git", "node_modules"]
performance:
  scan_chunk_size: 50000
  max_entries_per_task: 200000
elasticsearch:
  index_name: my-index
  bulk_size: 25000
"""
    )
    cfg = load_config(str(p))
    assert cfg.mode == "index-only"
    assert cfg.root_path == "/mnt/fs"
    assert set(cfg.skip_patterns) == {".DS_Store", ".git", "node_modules"}
    assert cfg.scan_chunk_size == 50000
    assert cfg.max_entries_per_task == 200000
    assert cfg.es_index == "my-index"
    assert cfg.es_bulk_size == 25000
