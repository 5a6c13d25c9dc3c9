#!/usr/bin/env python
"""Config-sweep benchmark harness — the reference's perf_test.py /
optimize_config.py (utils/perf_test.py:14-201, scripts/
optimize_config.py) re-expressed for Spark.

The reference sweeps indexer configs (workers, batch sizes) by
re-running the whole binary under each config and sampling psutil.
Spark-first: the knobs that matter are RUNTIME SQL confs — shuffle
partitions, broadcast threshold, AQE, whole-stage codegen — so one
long-lived session plays every trial (no JVM restart per config), and
each trial times the declared queries directly.

Usage:
  python tools/perf_sweep.py [--sf-dir DIR] [--queries a,b,c]
                             [--repeats N] [--out sweep.json]

Emits one JSON document: per-trial timings + the recommended config
(lowest suite total), plus best-per-query so a skewed single query
can't hide a config that wins everywhere else.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q03_top_revenue_orders",
    "topk_per_group",
    "rollup_directory_sizes",
    "merge_upsert_newer_wins",
    "dedup_exact",
]

# The sweep grid: every axis is a runtime-settable SQL conf.
GRID = {
    "spark.sql.shuffle.partitions": ["8", "32", "128"],
    "spark.sql.adaptive.enabled": ["true", "false"],
    "spark.sql.autoBroadcastJoinThreshold": ["10MB", "-1"],
}


def _system_sample() -> tuple[int, int, float] | None:
    """System-wide CPU jiffies (busy, total) + used memory MB — the
    reference's psutil per-trial sampling (utils/perf_test.py) without
    the dependency, and covering the Spark JVM child process which a
    RUSAGE_SELF of the Python driver would miss. Returns None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        total = sum(parts)
        busy = total - parts[3] - (parts[4] if len(parts) > 4 else 0)  # - idle/iowait
        mem = {}
        with open("/proc/meminfo") as f:
            for ln in f:
                k, rest = ln.split(":", 1)
                mem[k] = int(rest.split()[0])
        used_mb = (mem["MemTotal"] - mem["MemAvailable"]) / 1024.0
        return busy, total, used_mb
    except (OSError, KeyError, ValueError, IndexError):
        return None


def _trial_resources(before, after) -> dict:
    if before is None or after is None:
        return {}
    db, dt = after[0] - before[0], after[1] - before[1]
    return {
        "cpu_util_pct": round(100.0 * db / dt, 1) if dt > 0 else None,
        "mem_used_mb": round(after[2], 1),
    }


def run_sweep(
    sf_dir: str,
    query_names: list[str],
    repeats: int = 2,
    grid: dict[str, list[str]] | None = None,
) -> dict:
    from fs_indexer_elasticsearch_spark.plans import QUERIES
    from fs_indexer_elasticsearch_spark.session import get_spark

    from pyspark.sql import SparkSession

    grid = grid or GRID
    # Snapshot confs BEFORE get_spark: getOrCreate applies the factory
    # defaults onto an already-active session's runtime conf.
    active = SparkSession.getActiveSession()
    baseline = {k: active.conf.get(k) for k in grid} if active else None
    spark = get_spark("perf-sweep")
    if baseline is None:
        baseline = {k: spark.conf.get(k) for k in grid}
    queries = {n: QUERIES[n] for n in query_names}

    # Warm codegen for every query once, outside any trial.
    for fn in queries.values():
        fn(spark, sf_dir).collect()

    trials = []
    for combo in itertools.product(*grid.values()):
        conf = dict(zip(grid.keys(), combo))
        for k, v in conf.items():
            spark.conf.set(k, v)
        timings = {}
        sample0 = _system_sample()
        for name, fn in queries.items():
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        trials.append(
            {
                "conf": conf,
                "suite_seconds": round(sum(timings.values()), 3),
                "queries": timings,
                "resources": _trial_resources(sample0, _system_sample()),
            }
        )
    for k, v in baseline.items():  # leave the session as we found it
        spark.conf.set(k, v)

    best_trial = min(trials, key=lambda t: t["suite_seconds"])
    per_query_best = {
        n: min(trials, key=lambda t: t["queries"][n])["conf"] for n in queries
    }
    return {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "trials": trials,
        "recommended": best_trial["conf"],
        "recommended_suite_seconds": best_trial["suite_seconds"],
        "best_per_query": per_query_best,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    result = run_sweep(args.sf_dir, args.queries.split(","), args.repeats)
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
