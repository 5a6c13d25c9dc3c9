#!/usr/bin/env python
"""Per-query ANALYZED-plan fingerprints — the mechanical definition of
"this query's implementation changed" for the driver-prefix rotation
rule (r9 verdict #6).

For every registered query this builds the DataFrame (no execution
beyond what plan construction itself performs — store seeding, bounded
existence probes) and hashes the normalized analyzed logical plan:
expression ids, plan ids and other session-unique counters are
stripped; dataset-fingerprint-tagged store paths are KEPT (a store
schema/tag bump is a real implementation change). The resulting
name -> sha map is written to PLAN_FINGERPRINTS.json, committed per
round; tools/rotation_check.py diffs HEAD's map against the map at the
last driver round commit — a differing or new fingerprint means the
driver-visible computation changed and the query must rotate into the
checked prefix.

Plans are the right granularity: a runtime-only change (retry loops,
logging) leaves the produced rows identical, while any change to the
expression tree — the r9 dedup_simhash fold rewrite that nearly
slipped the human rule — flips the hash.

Usage: python tools/plan_fingerprints.py [--sf-dir D] [--out F] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def normalize_plan(s: str) -> str:
    s = re.sub(r"#\d+", "#", s)  # expression ids
    # Higher-order-function lambda variables carry a session-global
    # counter in their NAME (x_4, x_9, ...), not just the expr id.
    s = re.sub(r"lambda ([A-Za-z]\w*?)_\d+#", r"lambda \1_#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"cachedrdd-\d+", "cachedrdd-", s)
    # In-memory/checkpointed RDD ids and object addresses.
    s = re.sub(r"@[0-9a-f]{6,}", "@", s)
    s = re.sub(r"\bRDD( \d+)?\b", "RDD", s)
    return s


def fingerprint(df) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    return hashlib.sha256(normalize_plan(plan).encode()).hexdigest()[:16]


def build_fingerprints(spark, sf_dir: str, names=None) -> dict[str, str]:
    from fs_indexer_elasticsearch_spark.plans import QUERIES

    # Untruncated toString, or wide schemas elide "... N more fields"
    # at a conf-dependent cutoff and the hash stops being canonical.
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")

    out: dict[str, str] = {}
    for name in names or QUERIES:
        try:
            out[name] = fingerprint(QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            out[name] = f"ERROR:{type(e).__name__}"
            print(f"ERROR {name}: {e}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    a = ap.parse_args()

    from fs_indexer_elasticsearch_spark.session import get_spark

    spark = get_spark("plan-fingerprints")
    fps = build_fingerprints(spark, a.sf_dir, a.names or None)
    payload = json.dumps(fps, indent=0, sort_keys=True) + "\n"
    if a.out:
        with open(a.out, "w") as f:
            f.write(payload)
        print(f"wrote {a.out} ({len(fps)} queries)")
    else:
        print(payload)
    spark.stop()
    return 1 if any(v.startswith("ERROR:") for v in fps.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
