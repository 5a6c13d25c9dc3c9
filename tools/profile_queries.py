#!/usr/bin/env python
"""Per-query phase profiler for the optimization rounds (guide §1).

For each named query, separately times:
  - build_s: Python DataFrame construction (py4j + analysis + any
    actions the builder itself runs — store seeding, fixpoint loops);
  - noop1_s / noop2_s: first and second noop-sink executions of the
    built frame (guide §1.4 — computes every column, no driver fetch);
  - rebuild_noop_s: construct-then-noop from scratch (what bench's
    timed region actually pays per run);
  - jobs: Spark jobs launched by the rebuild run (scheduling overhead
    proxy — iterative queries pay one job per round).

Usage: python tools/profile_queries.py [--sf-dir D] names...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="+")
    a = ap.parse_args()

    from fs_indexer_elasticsearch_spark.plans import QUERIES
    from fs_indexer_elasticsearch_spark.session import get_spark

    spark = get_spark("profile-queries")
    sc = spark.sparkContext
    spark.read.parquet(f"{a.sf_dir}/region.parquet").count()  # JVM warm

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name in a.names:
        sc.setJobDescription(f"profile:{name}")
        try:
            # Warm pass first: store seeding / JIT paid outside timing.
            noop(QUERIES[name](spark, a.sf_dir))

            t0 = time.perf_counter()
            df = QUERIES[name](spark, a.sf_dir)
            build_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            noop(df)
            noop1_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            noop(df)
            noop2_s = time.perf_counter() - t0

            jobs0 = sc._jsc.sc().dagScheduler().nextJobId()  # noqa: SLF001
            t0 = time.perf_counter()
            noop(QUERIES[name](spark, a.sf_dir))
            rebuild_noop_s = time.perf_counter() - t0
            jobs1 = sc._jsc.sc().dagScheduler().nextJobId()  # noqa: SLF001

            results[name] = {
                "build_s": round(build_s, 3),
                "noop1_s": round(noop1_s, 3),
                "noop2_s": round(noop2_s, 3),
                "rebuild_noop_s": round(rebuild_noop_s, 3),
                "jobs": jobs1 - jobs0,
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": repr(e)[:300]}
        print(name, json.dumps(results[name]), flush=True)
        sc.setJobDescription(None)

    if a.out:
        with open(a.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
