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


def test_trial_resource_sampling():
    """Per-trial CPU/mem summaries (reference utils/perf_test.py parity)."""
    from tools.perf_sweep import _system_sample, _trial_resources

    s0 = _system_sample()
    assert s0 is not None  # Linux container
    busy, total, used_mb = s0
    assert 0 < busy <= total and used_mb > 0
    r = _trial_resources(s0, (busy + 50, total + 100, used_mb + 1))
    assert r["cpu_util_pct"] == 50.0
    assert r["mem_used_mb"] == round(used_mb + 1, 1)
    assert _trial_resources(None, s0) == {}
