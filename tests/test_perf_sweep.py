"""Config-sweep harness (tools/perf_sweep.py — the reference's
utils/perf_test.py:14-201 sweep shape): trials × confs × timed
queries, session confs restored afterwards."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))


def test_sweep_runs_and_restores_confs(spark):
    from perf_sweep import run_sweep

    before = spark.conf.get("spark.sql.shuffle.partitions")
    r = run_sweep(
        "/root/testdata/sf0.001",
        ["dedup_exact"],
        repeats=1,
        grid={"spark.sql.shuffle.partitions": ["2", "4"]},
    )
    assert len(r["trials"]) == 2
    assert {t["conf"]["spark.sql.shuffle.partitions"] for t in r["trials"]} == {"2", "4"}
    assert all(t["queries"]["dedup_exact"] > 0 for t in r["trials"])
    assert r["recommended"] in [t["conf"] for t in r["trials"]]
    assert r["best_per_query"]["dedup_exact"] in [t["conf"] for t in r["trials"]]
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
