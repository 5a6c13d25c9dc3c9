"""Versioned parquet snapshot store with atomic pointer swap and
bucket-pruned merges.

Replaces the reference's DuckDB transactional storage
(db_duckdb.py:184-268, scanner.py:220-248 BEGIN/COMMIT/ROLLBACK):
each write creates a NEW snapshot directory ``v<N>``, then atomically
updates the ``_CURRENT`` pointer file — readers always see a complete
snapshot; a failed write leaves the pointer untouched (A5 semantics).

Layout: data is hash-bucketed on the key (``_bucket = pmod(xxhash64(
key), num_buckets)``) and written ``partitionBy("_bucket")`` — one
directory per bucket.

Partition-pruned merge (the §7 "hard part" #1 — the property that
makes upsert-without-a-table-format survive 100 TB): a merge only
joins + rewrites the buckets the batch actually touches; every
untouched bucket's files are hard-linked forward into the new version
(O(1) per file, no data copy). A batch touching 1% of keys rewrites
≈1% of the table regardless of table size.

Old versions are retained for time travel / rollback; ``vacuum``
drops all but the newest k. NOTE: vacuum + hard links interact
safely — links keep bytes alive until the last referencing version
is removed.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import upsert_newer_wins

_POINTER = "_CURRENT"
_SCHEMA = "_SCHEMA.json"


class SnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        version_col: str,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        self.version_col = version_col
        self.num_buckets = num_buckets
        os.makedirs(path, exist_ok=True)

    # -- pointer management -------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.path, _POINTER)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _swap_pointer(self, version: int) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.num_buckets)).cast("int")

    # -- schema evolution ---------------------------------------------------
    # Reference parity: needs_schema_update / migrate_schema
    # (db_duckdb.py:369-419, 421-503) — detect drift between the stored
    # table and an incoming batch, then migrate by widening with typed
    # NULLs (added columns) or casting old data forward (retyped
    # columns) instead of raising. Migration recreates the table (the
    # reference copies into lucidlink_files_new) and bumps the schema
    # version recorded in _SCHEMA.json.

    def _schema_meta(self) -> dict:
        try:
            with open(os.path.join(self.path, _SCHEMA)) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return {"version": 0, "fields": {}}

    def schema_version(self) -> int:
        return self._schema_meta()["version"]

    def _record_schema(self, df: DataFrame) -> None:
        fields = {f.name: f.dataType.simpleString() for f in df.schema.fields
                  if f.name != "_bucket"}
        meta = self._schema_meta()
        if fields != meta["fields"]:
            meta = {"version": meta["version"] + 1, "fields": fields}
            tmp = os.path.join(self.path, _SCHEMA + ".tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f, indent=1)
            os.replace(tmp, os.path.join(self.path, _SCHEMA))

    def needs_schema_update(self, batch: DataFrame) -> bool:
        """True when the incoming batch's column set or types differ
        from the stored snapshot's (db_duckdb.py:369-419)."""
        cur = self.read()
        if cur is None:
            return False
        cur_fields = {
            f.name: f.dataType.simpleString()
            for f in cur.schema.fields
            if f.name != "_bucket"
        }
        new_fields = {f.name: f.dataType.simpleString() for f in batch.schema.fields
                      if f.name != "_bucket"}
        return cur_fields != new_fields

    def _migrate(self, current: DataFrame, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Align both sides on the union schema: columns only in the
        batch are added to current as typed NULLs; columns only in
        current are added to the batch as typed NULLs; a column present
        in both with a different type adopts the BATCH's type (the
        migration direction — old rows are cast forward, as the
        reference's copy-into-new-table does)."""
        cur_types = {f.name: f.dataType for f in current.schema.fields}
        new_types = {f.name: f.dataType for f in batch.schema.fields}
        names = list(cur_types) + [n for n in new_types if n not in cur_types]
        target = {n: new_types.get(n, cur_types.get(n)) for n in names}
        if self.key not in new_types or self.version_col not in new_types:
            raise ValueError(
                f"batch must carry key '{self.key}' and version '{self.version_col}'"
            )

        def align(df: DataFrame, have: dict) -> DataFrame:
            cols = []
            for n in names:
                if n not in have:
                    cols.append(F.lit(None).cast(target[n]).alias(n))
                elif have[n] != target[n]:
                    cols.append(F.col(n).cast(target[n]).alias(n))
                else:
                    cols.append(F.col(n))
            return df.select(*cols)

        return align(current, cur_types), align(batch, new_types)

    # -- read / write -------------------------------------------------------
    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._version_dir(v))

    def _write_buckets(self, df: DataFrame, out: str) -> None:
        (
            df.withColumn("_bucket", self._bucket_col())
            .repartition(self.num_buckets, "_bucket")
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(out)
        )

    def overwrite(self, df: DataFrame) -> int:
        v = (self.current_version() or 0) + 1
        out = self._version_dir(v)
        shutil.rmtree(out, ignore_errors=True)
        self._write_buckets(df.drop("_bucket"), out)
        self._record_schema(df)
        self._swap_pointer(v)
        return v

    def merge(self, batch: DataFrame, removed: DataFrame | None = None) -> int:
        """Newer-wins upsert of a batch into the current snapshot
        (the reference's ON CONFLICT ... WHERE excluded newer), plus
        optional key deletions (the reference's DELETE ... NOT IN,
        scanner.py:447-454), joining and rewriting ONLY the buckets the
        batch or the removals touch; untouched bucket files are
        hard-linked into the new version.

        ``removed`` is a one-column DataFrame of keys to delete.
        Removals land in the same buckets their keys hash to, so the
        incremental pipeline's steady-state cycle (upserts + deletes)
        stays O(delta) instead of O(table)."""
        cur_v = self.current_version()
        batch = batch.drop("_bucket")
        if cur_v is None:
            if removed is not None:
                batch = batch.join(
                    removed.select(F.col(removed.columns[0]).alias(self.key)),
                    on=self.key,
                    how="left_anti",
                )
            return self.overwrite(batch)

        if self.needs_schema_update(batch):
            # Schema drift → migrate: one O(table) rewrite under the
            # union schema (rare; mirrors the reference's
            # copy-into-new-table), then normal pruned merges resume.
            current, batch = self._migrate(self.read().drop("_bucket"), batch)
            merged = upsert_newer_wins(current, batch, self.key, self.version_col)
            if removed is not None:
                merged = merged.join(
                    removed.select(F.col(removed.columns[0]).alias(self.key)),
                    on=self.key,
                    how="left_anti",
                )
            return self.overwrite(merged)

        batch = batch.withColumn("_bucket", self._bucket_col()).cache()
        touched = {r._bucket for r in batch.select("_bucket").distinct().collect()}
        if removed is not None:
            removed = (
                removed.select(F.col(removed.columns[0]).alias(self.key))
                .withColumn("_bucket", self._bucket_col())
                .cache()
            )
            touched |= {r._bucket for r in removed.select("_bucket").distinct().collect()}
        touched = sorted(touched)
        cur_dir = self._version_dir(cur_v)
        v = cur_v + 1
        out = self._version_dir(v)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)

        if touched:
            # Merge only the touched buckets (partition pruning on the
            # _bucket directory column keeps the read proportional to
            # the batch, not the table).
            cur_touched = (
                self.spark.read.parquet(cur_dir)
                .filter(F.col("_bucket").isin(touched))
                .drop("_bucket")
            )
            merged = upsert_newer_wins(
                cur_touched, batch.drop("_bucket"), self.key, self.version_col
            )
            if removed is not None:
                merged = merged.join(
                    removed.select(self.key), on=self.key, how="left_anti"
                )
            self._write_buckets(merged, out)
        batch.unpersist()
        if removed is not None:
            removed.unpersist()

        # Hard-link every untouched bucket directory forward.
        touched_dirs = {f"_bucket={b}" for b in touched}
        for entry in os.listdir(cur_dir):
            if not entry.startswith("_bucket=") or entry in touched_dirs:
                continue
            src = os.path.join(cur_dir, entry)
            dst = os.path.join(out, entry)
            os.makedirs(dst, exist_ok=True)
            for fname in os.listdir(src):
                if fname.startswith((".", "_")):
                    continue
                os.link(os.path.join(src, fname), os.path.join(dst, fname))
        self._swap_pointer(v)
        return v

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` versions (never the
        current one)."""
        cur = self.current_version()
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        )
        victims = [v for v in versions[:-keep] if v != cur]
        for v in victims:
            shutil.rmtree(self._version_dir(v), ignore_errors=True)
        return victims
