"""Versioned parquet snapshot store with atomic pointer swap.

Replaces the reference's DuckDB transactional storage
(db_duckdb.py:184-268, scanner.py:220-248 BEGIN/COMMIT/ROLLBACK):
each merge writes a NEW snapshot directory ``v<N>``, then atomically
updates the ``_CURRENT`` pointer file — readers always see a complete
snapshot; a failed write leaves the pointer untouched (A5 semantics).

Scale design (the §7 "hard part" #1):
 - data is hash-partitioned on the key into ``num_buckets`` files via
   repartition(key) so merges co-partition without re-shuffling the
   incoming batch against a differently-laid-out table.
 - at 100 TB, a batch touching few keys only needs the merge join on
   buckets containing those keys; untouched bucket files could be
   hard-linked forward (partition-pruned merge). The bucket column is
   written into the data so readers can prune on it.
 - old versions are retained for time travel / rollback; ``vacuum``
   drops all but the newest k.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import upsert_newer_wins

_POINTER = "_CURRENT"


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

    # -- read / write -------------------------------------------------------
    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._version_dir(v))

    def _write_version(self, df: DataFrame, version: int) -> None:
        out = self._version_dir(version)
        (
            df.withColumn(
                "_bucket", F.pmod(F.xxhash64(F.col(self.key)), self.num_buckets)
            )
            .repartition(self.num_buckets, "_bucket")
            .write.mode("overwrite")
            .parquet(out)
        )
        self._swap_pointer(version)

    def overwrite(self, df: DataFrame) -> int:
        v = (self.current_version() or 0) + 1
        self._write_version(df.drop("_bucket"), v)
        return v

    def merge(self, batch: DataFrame) -> int:
        """Newer-wins upsert of a batch into the current snapshot
        (the reference's ON CONFLICT ... WHERE excluded newer)."""
        cur = self.read()
        batch = batch.drop("_bucket")
        if cur is None:
            return self.overwrite(batch)
        merged = upsert_newer_wins(
            cur.drop("_bucket"), batch, self.key, self.version_col
        )
        v = (self.current_version() or 0) + 1
        self._write_version(merged, v)
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
