#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into a directory.

Optimization-round evidence tool: the judge checks plan-shape claims
(Exchange counts, join strategies, PushedFilters) against committed
plan files, so every optimized query gets a ``<name>_before.txt`` and
``<name>_after.txt`` snapshot from this tool.

Usage: python tools/capture_plans.py --out plans/r14 --suffix before [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # noqa: SLF001


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r14"))
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    a = ap.parse_args()

    from fs_indexer_elasticsearch_spark.plans import QUERIES
    from fs_indexer_elasticsearch_spark.session import get_spark

    os.makedirs(a.out, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    names = a.names or list(QUERIES)
    n_err = 0
    for name in names:
        try:
            df = QUERIES[name](spark, a.sf_dir)
            text = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            text = f"ERROR: {e!r}"
            n_err += 1
        path = os.path.join(a.out, f"{name}_{a.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
