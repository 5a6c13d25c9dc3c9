"""CLI entry point — `python -m fs_indexer_elasticsearch_spark`.

Mirrors the reference's `python -m fs_indexer_elasticsearch.main`
argument surface (main.py:34-63: --config, --root-path, --mode,
--version) on top of the Spark pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="fs_indexer_elasticsearch_spark",
        description="PySpark filesystem indexing pipeline",
    )
    ap.add_argument("--config", help="YAML config path")
    ap.add_argument("--root-path", help="filesystem root to scan")
    ap.add_argument(
        "--mode",
        choices=["elasticsearch", "index-only"],
        help="publish to ES bulk files or snapshot only",
    )
    ap.add_argument("--out-dir", default="./out", help="bulk/delete output dir")
    ap.add_argument("--direct-links", action="store_true", help="enable enrichment")
    ap.add_argument("--version", action="version", version="0.1.0")
    args = ap.parse_args(argv)

    from .pipeline import run_pipeline
    from .session import get_spark
    from .sources.config import load_config

    cfg = load_config(args.config)
    if args.root_path:
        cfg.root_path = args.root_path
    if args.mode:
        cfg.mode = args.mode
    if args.direct_links:
        cfg.direct_links_enabled = True

    spark = get_spark("fs-indexer-pipeline")
    try:
        result = run_pipeline(spark, cfg, out_dir=args.out_dir)
        summary = {
            "snapshot_version": result.snapshot_version,
            "stats": result.stats,
            "bulk_dir": result.bulk_dir,
            "delete_dir": result.delete_dir,
            "changes": (
                {
                    r.change: r.n
                    for r in result.diff.groupBy("change")
                    .agg(F_count())
                    .collect()
                }
                if result.diff is not None
                else None
            ),
        }
        print(json.dumps(summary, default=str))
        return 0
    finally:
        spark.stop()


def F_count():
    import pyspark.sql.functions as F

    return F.count(F.lit(1)).alias("n")


if __name__ == "__main__":
    sys.exit(main())
