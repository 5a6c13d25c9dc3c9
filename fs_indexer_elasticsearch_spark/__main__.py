"""CLI entry point — `python -m fs_indexer_elasticsearch_spark`.

Two subcommands:

- ``index`` (the default when no subcommand is given — reference
  parity with `python -m fs_indexer_elasticsearch.main`'s argument
  surface, main.py:34-63: --config, --root-path, --mode): one
  scan → merge → enrich → publish cycle over a filesystem root.
- ``corpus-build``: the training-corpus side of the engine — run the
  composed curation pipeline (plans/curation_pipeline.curate_stages:
  URL-canon dedup → blocklist → quality gate → prefix-hash dedup →
  per-lang token budget) over a documents parquet, merge the selected
  set into a versioned curated-corpus snapshot store, and publish the
  cycle's CHANGES as ES bulk NDJSON via the store's change feed
  (publish_mode='changed' semantics) — so the r8 curation + CDC
  features are reachable without writing Python.

``main(argv, spark=...)`` accepts an injected SparkSession (tests pass
the shared fixture; only a session the CLI created itself is stopped).
"""

from __future__ import annotations

import argparse
import json
import sys


def _index_parser() -> argparse.ArgumentParser:
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
    ap.add_argument(
        "--publish-mode",
        choices=["full", "changed"],
        help="ES publish scope per cycle: full republish (reference "
        "parity) or only this cycle's change feed (O(changed))",
    )
    ap.add_argument(
        "--merge-retries",
        type=int,
        default=None,
        metavar="N",
        help="optimistic rebase-and-retry budget for snapshot commits "
        "(0 = fail-fast single-writer, the default)",
    )
    ap.add_argument("--version", action="version", version="0.1.0")
    return ap


def _run_index(args, spark) -> int:
    import pyspark.sql.functions as F

    from .pipeline import run_pipeline
    from .sources.config import load_config

    cfg = load_config(args.config)
    if args.root_path:
        cfg.root_path = args.root_path
    if args.mode:
        cfg.mode = args.mode
    if args.direct_links:
        cfg.direct_links_enabled = True
    if args.publish_mode:
        cfg.publish_mode = args.publish_mode
    if args.merge_retries is not None:
        cfg.merge_retries = args.merge_retries

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
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            if result.diff is not None
            else None
        ),
    }
    print(json.dumps(summary, default=str))
    return 0


def _run_corpus_build(args, spark) -> int:
    import os

    import pyspark.sql.functions as F

    from .plans.curation_pipeline import curate_stages, curation_report
    from .sinks.es_bulk import (
        bulk_actions,
        sync_actions_from_changes,
        write_bulk_file,
    )
    from .sinks.snapshot import SnapshotStore

    docs = spark.read.parquet(args.documents)
    stages = curate_stages(docs, token_budget=args.token_budget)
    report_rows = [r.asDict() for r in curation_report(stages).collect()]

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "curation_report.json"), "w") as f:
        json.dump(sorted(report_rows, key=lambda r: r["lang"]), f, indent=1)

    store = SnapshotStore(
        spark,
        os.path.join(args.snapshot_path, "curated_corpus"),
        key="doc_id",
        version_col="batch_seq",
        num_buckets=args.num_buckets,
    )
    prev = store.current_version()
    selected = stages["s5"].select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size("toks").cast("long").alias("n_tokens"),
        "score",
        F.lit((prev or 0) + 1).cast("long").alias("batch_seq"),
    )
    if prev is None:
        version = store.merge(selected)
    else:
        # Reduce the cycle to its REAL delta before merging: batch_seq
        # is a cycle counter, so merging the whole selected set would
        # stamp every unchanged doc with a new seq and the change feed
        # would republish the entire corpus each build. Diff on the
        # content columns, upsert only added/changed docs, and delete
        # docs that fell OUT of the curated set (a new duplicate
        # shadowing them, a source doc gone) — exactly the fs
        # pipeline's scan-vs-snapshot discipline.
        from .operators.merge import snapshot_diff

        cur = store.read().drop("_bucket")
        diff = snapshot_diff(
            cur,
            selected,
            key="doc_id",
            compare_cols=["lang", "source", "text", "n_tokens", "score"],
        ).localCheckpoint(eager=False)
        if diff.isEmpty():
            version = prev  # no-change cycle: no version churn
        else:
            upserts = selected.join(
                diff.filter(F.col("change").isin("added", "changed")).select(
                    "doc_id"
                ),
                "doc_id",
                "left_semi",
            )
            removed = diff.filter(F.col("change") == "removed").select("doc_id")
            version = store.merge(upserts, removed=removed)

    bulk_dir = os.path.join(args.out_dir, "bulk")
    if prev is None:
        # First build: everything is new — full publish.
        docs_out = store.read().drop("_bucket", "batch_seq")
        actions = bulk_actions(
            docs_out.withColumnRenamed("doc_id", "id"), args.es_index
        )
    else:
        # Steady state: ship only what this cycle's merge changed —
        # including DELETE actions for docs curated out — straight
        # from the store's commit metadata.
        actions = sync_actions_from_changes(
            store,
            args.es_index,
            prev,
            version,
            format_docs=lambda df: df.drop("batch_seq"),
        )
    write_bulk_file(actions, bulk_dir)
    if args.keep_versions is not None:
        store.vacuum(keep=args.keep_versions)

    summary = {
        "snapshot_version": version,
        "bulk_dir": bulk_dir,
        "report": os.path.join(args.out_dir, "curation_report.json"),
        "n_selected": int(sum(r["n_selected"] for r in report_rows)),
        "selected_tokens": int(sum(r["selected_tokens"] for r in report_rows)),
    }
    print(json.dumps(summary, default=str))
    return 0


def main(argv: list[str] | None = None, spark=None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if argv and argv[0] == "corpus-build":
        ap = argparse.ArgumentParser(
            prog="fs_indexer_elasticsearch_spark corpus-build",
            description="curate a documents parquet into a versioned "
            "corpus snapshot + CDC bulk publish",
        )
        ap.add_argument("--documents", required=True, help="documents parquet path")
        ap.add_argument("--out-dir", required=True, help="report + bulk output dir")
        ap.add_argument(
            "--snapshot-path", required=True, help="curated-corpus store root"
        )
        ap.add_argument("--es-index", default="curated-corpus")
        ap.add_argument("--token-budget", type=int, default=800)
        ap.add_argument("--num-buckets", type=int, default=16)
        ap.add_argument("--keep-versions", type=int, default=None)
        args = ap.parse_args(argv[1:])
        runner = _run_corpus_build
    else:
        if argv and argv[0] == "index":
            argv = argv[1:]
        args = _index_parser().parse_args(argv)
        runner = _run_index

    own_session = spark is None
    if own_session:
        from .session import get_spark

        spark = get_spark("fs-indexer-pipeline")
    try:
        return runner(args, spark)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
