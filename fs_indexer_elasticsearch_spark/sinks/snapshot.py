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

Two storage layouts, selectable per store:

- ``layout="hardlink"`` (default): one directory per version; untouched
  bucket FILES are hard-linked forward (O(1) per file). Assumes a POSIX
  filesystem (local disk, NFS).
- ``layout="manifest"``: all data files live once under ``data/``;
  each version is a ``_MANIFEST_v<N>.json`` listing the exact parquet
  files per bucket. A merge writes ONLY the touched buckets' new files
  plus a new manifest that carries untouched buckets' entries forward —
  no links, no renames, no copies, so it is safe on object stores
  (S3/GCS) where hard links don't exist and rename is a copy. This is
  the same commit protocol Iceberg/Delta use (write files, then swap a
  tiny metadata pointer).

The bucket COUNT is a per-version property (``_STORECFG_v<N>``,
committed before the pointer swap) evolvable via ``rebucket`` —
partition evolution for a growing corpus; the rest of the physical
identity (key, bucket_key, version_col, layout) is immutable and
validated on reopen against ``_LAYOUT.json``.

Writes are single-writer by contract, and the contract is ENFORCED
fail-fast: every commit first atomically claims its version number
(``_TXN_v<N>``, created by an atomic hard-link of a pid-stamped temp
file — the POSIX stand-in for an object store's if-none-match
conditional put) and re-verifies the pointer under the claim against
the version its DATA BASIS was read from (``expected_base`` on the
paths that derive from an earlier read), so a racing writer raises
ConcurrentWriteError before writing any data and a stale read can
never silently overwrite a newer commit (lost update). Crashed
writers' claims are cleared by a pid-liveness check via atomic
rename (one clearer wins — no remove/recreate race); on an object
store the same roles are played by lease timestamps and conditional
puts.
"""

from __future__ import annotations

import json
import os
import shutil
from contextlib import contextmanager

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import upsert_newer_wins

_POINTER = "_CURRENT"
_SCHEMA = "_SCHEMA.json"
_META_PREFIX = "_META_v"
# Per-version physical-layout config (today: the bucket count),
# committed before the pointer swap exactly like _META_v — so the
# effective bucket count is a property OF THE VERSION, and crash
# recovery / rollback / time travel all resolve the layout each
# version was actually written under. See ``rebucket``.
_CFG_PREFIX = "_STORECFG_v"
# Immutable store identity, written at first commit and validated on
# reopen: hashing probes against a store whose physical buckets were
# laid out under a DIFFERENT bucket_key (or reading a manifest store
# as a hardlink one) fails silently — pruned reads return the wrong
# slice and merges scatter duplicate keys across buckets. Mismatch is
# therefore a constructor-time ValueError, not a runtime mystery.
_LAYOUT_FILE = "_LAYOUT.json"
# Per-version write claim (fail-fast concurrent-writer guard): a
# commit of version N first atomically creates _TXN_vN (O_EXCL) —
# see _txn().
_TXN_PREFIX = "_TXN_v"


class ConcurrentWriteError(RuntimeError):
    """A second writer raced this store's commit. The store is
    single-writer by contract; this error upgrades a violation from
    silent lost-update to a fail-fast exception raised BEFORE the
    loser writes any data."""


def retry_concurrent(
    fn,
    *,
    max_retries: int,
    backoff_s: float = 0.05,
    no_retry: tuple[type[BaseException], ...] = (),
):
    """THE bounded optimistic retry loop — one definition shared by
    ``merge_with_retry``, the IVF add and the hot-cell split (r11
    review: the backoff formula had been copied three times).
    Re-runs ``fn`` on ConcurrentWriteError up to ``max_retries``
    times with exponential backoff and deterministic per-attempt
    jitter (hash of pid+attempt — no wall-clock randomness), so two
    same-moment losers de-synchronize reproducibly. ``fn`` must
    re-read whatever state it validates on every call (rebase, not
    replay). ``no_retry`` lists exception types that re-raise
    immediately even if they subclass ConcurrentWriteError — the
    terminal-abort channel (e.g. a centroid-generation move, where
    retrying can never succeed)."""
    import time

    attempt = 0
    while True:
        try:
            return fn()
        except no_retry:
            raise
        except ConcurrentWriteError:
            if attempt >= max_retries:
                raise
            jitter = ((os.getpid() * 1103515245 + attempt) % 97) / 97.0
            time.sleep(backoff_s * (2**attempt) * (0.5 + jitter))
            attempt += 1


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True


def classify_changes(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    update_images: str = "post",
) -> DataFrame:
    """Row-level change classification between two same-schema states:
    one row per key whose state differs, ``_change`` = 'insert' /
    'update' / 'delete' (post-image for insert/update, pre-image for
    delete). Null-safe column comparison — exact, never a hash — so
    identical rows are dropped, not surfaced as phantom updates.
    Shared by read_changes (two committed versions) and the streaming
    change-feed cadence (pre-commit: current slice vs the batch's
    would-be merge result).

    ``update_images="both"`` emits TWO rows per update —
    'update_preimage' (old values) and 'update_postimage' (new) — the
    Delta-CDF shape incremental VIEW MAINTENANCE needs: a downstream
    aggregate subtracts pre-images and adds post-images, so sums/counts
    over a 100 TB base update from the feed alone, never a rescan."""
    from functools import reduce

    if update_images not in ("post", "both"):
        raise ValueError(f"update_images must be 'post' or 'both', got {update_images!r}")
    # Presence tags so NULL-valued keys can't be mistaken for absence.
    o = old.withColumn("_o", F.lit(1)).alias("o")
    n = new.withColumn("_n", F.lit(1)).alias("n")
    joined = o.join(
        n,
        reduce(
            lambda a, b: a & b,
            [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
        ),
        "full_outer",
    )
    data_cols = [c for c in new.columns if c not in keys]
    same = (
        reduce(
            lambda a, b: a & b,
            [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in data_cols],
        )
        if data_cols
        else F.lit(True)
    )
    update_label = "update_postimage" if update_images == "both" else "update"
    change = (
        F.when(F.col("o._o").isNull(), F.lit("insert"))
        .when(F.col("n._n").isNull(), F.lit("delete"))
        .when(same, F.lit(None))  # identical: drop
        .otherwise(F.lit(update_label))
    )
    post = F.col("n._n").isNotNull()
    classified = joined.withColumn("_change", change).filter(
        F.col("_change").isNotNull()
    )
    if update_images == "both":
        # Two consumers (post rows + pre rows) would re-execute the
        # full-outer join. EAGER (r15; the r14 sweep missed this site):
        # the two consumers are branches of one UNION plan, so a lazy
        # checkpoint's blocks are race-computed inside the first action
        # and the join ran twice anyway — in EVERY
        # read_changes(update_images="both") consumer (~40 queries).
        # ckpt_shared applies the size-gated policy (tables.py).
        from ..tables import ckpt_shared

        classified = ckpt_shared(classified)
    out = classified.select(
        *[
            F.when(post, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
            for c in new.columns
        ],
        "_change",
    )
    if update_images == "both":
        pre = classified.filter(
            F.col("_change") == "update_postimage"
        ).select(
            *[F.col(f"o.{c}").alias(c) for c in new.columns],
            F.lit("update_preimage").alias("_change"),
        )
        out = out.unionByName(pre)
    return out


class SnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str | list[str],
        version_col: str,
        num_buckets: int = 32,
        layout: str = "hardlink",
        bucket_key: str | None = None,
        dedup_current: bool = False,
    ):
        """``bucket_key`` (default: ``key``) is the column the physical
        bucket layout hashes on. Separating it from the merge key lets
        an INDEX table co-locate rows by lookup key while upserting by
        row identity — e.g. the MinHash band store buckets on the band
        hash ``h`` (so a batch's band lookups and merges prune to the
        buckets its bands hash into) but upserts by the unique
        ``doc:band`` row key (many docs share a band hash; keying the
        upsert on ``h`` would collapse them).

        ``dedup_current``: opt-in for stores whose bucket layout can
        hold SUPERSEDED copies of a key (bucket_key != key, rows
        re-bucketed over time — e.g. the IVF index's dead weight under
        retired cell ids). Merges then collapse the touched current
        slice to its newest row per key before joining, instead of
        assuming key-uniqueness (see upsert_newer_wins)."""
        if layout not in ("hardlink", "manifest"):
            raise ValueError(f"unknown layout {layout!r}")
        if not isinstance(key, str) and bucket_key is None:
            raise ValueError(
                "a composite key cannot derive the physical bucket "
                "layout — pass bucket_key explicitly"
            )
        self.spark = spark
        self.path = path
        self.key = key
        self.version_col = version_col
        self.dedup_current = dedup_current
        # Seed value only: once the store has a committed version the
        # EFFECTIVE count is the one recorded with that version (the
        # _STORECFG sidecar — see the ``num_buckets`` property), so
        # reopening an existing store with a different constructor
        # value ADOPTS the on-disk truth instead of silently hashing
        # probes into the wrong physical layout. ``rebucket`` is the
        # only way to change the count of a non-empty store.
        self._default_buckets = num_buckets
        self._pinned_buckets: int | None = None  # rebucket's override
        self._rebucket_base: int | None = None  # rebucket's provenance tag
        self._cfg_cache: tuple[int | None, int] = (None, num_buckets)
        self.layout = layout
        self.bucket_key = bucket_key or key
        os.makedirs(path, exist_ok=True)
        self._check_identity()
        self._backfill_cfg()

    def _backfill_cfg(self) -> None:
        """First reopen of a store written before _STORECFG sidecars
        existed: pin the CURRENT version's bucket count on disk —
        DERIVED FROM THE COMMITTED DATA, not from any opener's
        constructor value — so every subsequent open adopts the
        recorded count instead of its own constructor default. The
        constructor value is only a hypothesis here: when openers with
        different counts race this backfill, trusting whichever wins
        the flock would (for a wrong winner) silently hash every
        pruned read into a phantom layout — read_keys would prune to
        bucket files the keys don't live in and return EMPTY, the
        worst failure mode for a store. ``_derive_legacy_buckets``
        recovers the true count from the data's own (key, bucket)
        labels, so the pinned value is winner-independent. New stores
        never hit this: every commit writes its own cfg."""
        import fcntl

        v = self.current_version()
        if v is None or self._read_cfg(v) is not None:
            return
        # Under the store's claim flock: concurrent openers must not
        # race the check-then-replace — one derives and writes, the
        # rest adopt the on-disk truth (re-read after the write, so
        # _cfg_cache can never disagree with the file).
        with open(os.path.join(self.path, ".claims.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                cfg = self._read_cfg(v)
                if cfg is None:
                    n = self._derive_legacy_buckets(v)
                    tmp = self._cfg_path(v) + f".tmp.{os.getpid()}"
                    with open(tmp, "w") as f:
                        json.dump({"num_buckets": n}, f)
                    os.replace(tmp, self._cfg_path(v))
                    cfg = self._read_cfg(v)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
        self._cfg_cache = (v, cfg["num_buckets"])

    def _derive_legacy_buckets(self, v: int) -> int:
        """Recover the bucket count a cfg-less legacy version was
        PHYSICALLY written under, from the data itself. The on-disk
        layout labels every row with its bucket (``_bucket=N``
        partition dirs / manifest bucket->files map), and the writer
        computed that label as ``pmod(xxhash64(bucket_key), n)`` — so
        for every row, the true ``n`` divides ``xxhash64(key) −
        bucket``. The gcd of those differences is taken over EVERY
        row of the version (r11 advice: a per-bucket sample cap left
        a probabilistic window — with 1-2 rows per bucket a wrong
        constructor value has a ~1/d chance per row of spuriously
        passing the divisibility check, and the unsampled rows then
        hash into phantom bucket files on every pruned read). With
        full coverage the adopted count is PROVEN consistent with the
        data: any ``n`` dividing the full-store gcd assigns every
        stored row exactly its physical bucket label, so pruned
        reads, keyed lookups, and partial merges all resolve to the
        files the rows actually live in.

        The scan is distributed — each partition folds its own
        ``gcd(h − b)`` in exact Python integers (no int64 wraparound:
        ``|h − b|`` can exceed the long range) and the driver folds
        one partial row per partition, never the data.

        Cost: one flock-serialized, column-pruned pass over the
        version at the first reopen of a pre-sidecar store — never on
        the hot path; every commit since sidecars exist records its
        own cfg."""
        import math

        if self.layout == "manifest":
            files = self._read_manifest(v)
            occupied = sorted(b for b, rels in files.items() if rels)
            if not occupied:
                return self._default_buckets
            parts = []
            for b in occupied:
                paths = [os.path.join(self._data_dir(), r) for r in files[b]]
                parts.append(
                    self.spark.read.option("recursiveFileLookup", "true")
                    .parquet(*paths)
                    .select(
                        F.xxhash64(F.col(self.bucket_key)).alias("h"),
                        F.lit(b).alias("_bucket"),
                    )
                )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        else:
            vdir = self._version_dir(v)
            occupied = sorted(
                int(e.split("=", 1)[1])
                for e in (os.listdir(vdir) if os.path.isdir(vdir) else ())
                if e.startswith("_bucket=")
            )
            if not occupied:
                return self._default_buckets
            df = self.spark.read.parquet(vdir).select(
                F.xxhash64(F.col(self.bucket_key)).alias("h"),
                F.col("_bucket").cast("int").alias("_bucket"),
            )

        def _partial_gcd(batches):
            import pandas as pd

            g, mx, cnt = 0, -1, 0
            for pdf in batches:
                hs = pdf["h"].to_numpy()
                bs = pdf["_bucket"].to_numpy()
                cnt += len(hs)
                if len(bs):
                    mx = max(mx, int(bs.max()))
                for h, b in zip(hs.tolist(), bs.tolist()):
                    g = math.gcd(g, h - b)
                    if g == 1:
                        break
                if g == 1:
                    break
            # g as string: a single-row partition's |h − b| can
            # exceed int64, and gcd never grows past its inputs.
            yield pd.DataFrame({"g": [str(g)], "mx": [mx], "cnt": [cnt]})

        partials = df.mapInPandas(
            _partial_gcd, "g string, mx int, cnt long"
        ).collect()  # bounded: one row per scan partition
        if not partials or sum(r.cnt for r in partials) == 0:
            return self._default_buckets
        max_b = max(r.mx for r in partials)
        g = 0
        for r in partials:
            g = math.gcd(g, int(r.g))
        d = self._default_buckets
        # Constructor value first: when it's the true count (the
        # common case — same code opened the store that wrote it), g
        # may be a small multiple of it; with every row folded into g
        # the divisibility check is a proof, not a sample — keep the
        # familiar value instead of over-splitting.
        if d > max_b and (g == 0 or g % d == 0):
            return d
        if g:
            # Smallest divisor of g that can label every occupied
            # bucket — with full-row coverage, that's the written
            # count (wrong counts fail the mod on some row).
            for cand in range(max_b + 1, min(abs(g), 1 << 20) + 1):
                if g % cand == 0:
                    return cand
        raise RuntimeError(
            f"cannot derive the bucket layout of legacy store "
            f"{self.path!r} v{v}: the rows are "
            f"inconsistent with constructor num_buckets={d} and no "
            f"count ≤ 2^20 fits (gcd={g}, max bucket={max_b}). "
            "Refusing to guess — a wrong count silently empties "
            "pruned reads. Reopen with the count the store was "
            "written with, or rebucket after a full read()."
        )

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

    # -- write transaction (fail-fast concurrency guard) ----------------------
    def _txn_path(self, version: int) -> str:
        return os.path.join(self.path, f"{_TXN_PREFIX}{version}")

    def _claim(self, version: int) -> None:
        """Atomically claim the right to commit ``version`` by LINKING
        a pid-stamped temp file into the claim path — atomic
        create-WITH-content (the POSIX stand-in for an object store's
        if-none-match conditional put), so an existing claim always
        carries its holder's pid; an unreadable/empty claim can only
        be corruption and is therefore stale by definition. A racing
        writer fails HERE, before writing any data.

        The inspect-stale/clear/create sequence runs under a kernel
        flock on a sidecar lock file: check-then-clear without it is
        an irreducible TOCTOU (two writers racing to clear the same
        dead claim can steal each other's FRESH claims, however the
        clear is expressed — remove or rename). The flock serializes
        only this microseconds-long acquisition section, is released
        by the kernel if the holder dies, and binds all cooperating
        writers (the single-writer contract's scope); the claim FILE
        remains the visible, pid-stamped, crash-inspectable token."""
        import fcntl
        import uuid as _uuid

        path = self._txn_path(version)
        tmp = f"{path}.pid.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
        try:
            with open(os.path.join(self.path, ".claims.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                try:
                    try:
                        os.link(tmp, path)  # atomic create-with-content
                        return
                    except FileExistsError:
                        pass
                    try:
                        with open(path) as f:
                            holder = int(f.read().strip() or "0")
                    except (OSError, ValueError):
                        holder = 0  # corrupt OR just released (see below)
                    if holder == os.getpid() or (holder and _pid_alive(holder)):
                        raise ConcurrentWriteError(
                            f"version {version} of {self.path} is being "
                            f"committed by pid {holder}; this store is "
                            "single-writer — serialize commits (the "
                            "registered queries flock the store dir for "
                            "exactly this reason)"
                        )
                    # Stale (dead holder or corrupt): clear and take it —
                    # safe under the flock, no second CLEARER can run.
                    # RELEASE, however, happens outside the flock (the
                    # holder must not need the lock to give the claim
                    # up), so the file may have vanished between the
                    # failed link and here — missing is success for a
                    # clear.
                    try:
                        os.remove(path)
                    except FileNotFoundError:
                        pass
                    os.link(tmp, path)
                    return
                finally:
                    fcntl.flock(lk, fcntl.LOCK_UN)
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def _release(self, version: int) -> None:
        try:
            os.remove(self._txn_path(version))
        except OSError:
            pass

    @contextmanager
    def _txn(self, base: int | None):
        """Commit transaction for the version after ``base``: claim it,
        then re-verify the pointer still names ``base`` (a commit that
        slipped in between reading the pointer and claiming would
        otherwise be silently overwritten — the classic lost update).
        Sound because pointer advance to N requires the claim of N,
        claims are mutually exclusive, and the pointer only moves
        forward during commits — so between the re-check and this
        writer's swap nobody else can advance it. The claim is always
        released (committed or failed); a kill -9 leaves a stale claim
        that the next writer's liveness check clears."""
        v = (base or 0) + 1
        self._claim(v)
        try:
            if self.current_version() != base:
                raise ConcurrentWriteError(
                    f"pointer of {self.path} moved from {base} to "
                    f"{self.current_version()} since this write began; "
                    "lost update prevented — re-read and retry"
                )
            yield v
        finally:
            self._release(v)

    # -- store identity ------------------------------------------------------
    def _identity(self) -> dict:
        return {
            "key": [self.key] if isinstance(self.key, str) else list(self.key),
            "bucket_key": self.bucket_key,
            "version_col": self.version_col,
            "layout": self.layout,
        }

    def _check_identity(self) -> None:
        """Reopen-time guard: the merge key, bucket column, version
        column, and physical layout are IMMUTABLE store properties —
        opening with different ones corrupts silently (wrong-slice
        pruned reads, duplicate keys scattered across buckets), so
        mismatch raises here instead. The bucket COUNT is deliberately
        not identity: it is versioned per commit and evolvable via
        ``rebucket``."""
        try:
            with open(os.path.join(self.path, _LAYOUT_FILE)) as f:
                on_disk = json.load(f)
        except (FileNotFoundError, ValueError):
            return  # new store, or one created before identity files
        mine = self._identity()
        if on_disk != mine:
            raise ValueError(
                f"snapshot store at {self.path} was created as {on_disk} "
                f"but opened as {mine}; key/bucket_key/version_col/layout "
                "are immutable (the bucket COUNT evolves via rebucket())"
            )

    def _write_identity(self) -> None:
        p = os.path.join(self.path, _LAYOUT_FILE)
        if os.path.exists(p):
            return
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._identity(), f, indent=1)
        os.replace(tmp, p)

    # -- per-version bucket count -------------------------------------------
    @property
    def num_buckets(self) -> int:
        """The bucket count of the CURRENT version — resolved from the
        version's committed _STORECFG sidecar, so every probe, merge,
        and pruned read hashes against the layout the live data was
        actually written under, no matter what the constructor said.
        Empty store: the constructor's value. A store written before
        config sidecars existed gets its count pinned at first reopen
        (``_backfill_cfg``), so even legacy stores stop trusting later
        constructors after one open."""
        if self._pinned_buckets is not None:
            return self._pinned_buckets
        v = self.current_version()
        if v is None:
            return self._default_buckets
        cached_v, cached_n = self._cfg_cache
        if cached_v == v:
            return cached_n
        cfg = self._read_cfg(v)
        n = cfg.get("num_buckets", self._default_buckets) if cfg else self._default_buckets
        self._cfg_cache = (v, n)
        return n

    def _cfg_path(self, version: int) -> str:
        return os.path.join(self.path, f"{_CFG_PREFIX}{version}.json")

    def _read_cfg(self, version: int) -> dict | None:
        try:
            with open(self._cfg_path(version)) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _commit_cfg(self, version: int, schema=None) -> None:
        """Record the bucket count version ``version`` is being written
        under — before its pointer swap, same crash contract as meta:
        an orphan _STORECFG with n > pointer is never read (exact-
        version resolution) and vacuum GCs it.

        ``schema`` (r15, optimization): the written DataFrame's schema
        (``_bucket`` excluded), recorded as Spark schema JSON so reads
        of this version can PIN it instead of re-inferring from
        parquet footers — every ``spark.read.parquet`` without a
        schema costs a driver-side footer fetch per call, and the
        store-backed queries issue several reads per maintenance
        cycle. Versions committed before this field existed fall back
        to inference (read paths check for the key)."""
        import time

        n = self.num_buckets
        cfg: dict = {"num_buckets": n, "committed_at": round(time.time(), 3)}
        if schema is not None:
            import json as _json

            fields = [f for f in schema.fields if f.name != "_bucket"]
            cfg["schema_json"] = _json.dumps(
                {"type": "struct", "fields": [f.jsonValue() for f in fields]}
            )
        if self._rebucket_base is not None:
            # Provenance tag: this version is a PURE REBUCKET of that
            # base — same rows, new physical layout. The change feed
            # uses it to contribute ZERO changed keys for this
            # transition instead of degrading to a full two-version
            # diff (bucket ids alone are incomparable across counts).
            cfg["rebucket_from"] = self._rebucket_base
        tmp = self._cfg_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, self._cfg_path(version))
        self._cfg_cache = (version, n)

    def _pinned_schema(self, cfg: dict | None):
        """StructType recorded at commit time for a version (None for
        legacy versions → the caller infers from footers)."""
        if not cfg or "schema_json" not in cfg:
            return None
        import json as _json

        from pyspark.sql.types import StructType

        return StructType.fromJson(_json.loads(cfg["schema_json"]))

    # -- per-version meta payload --------------------------------------------
    # A small JSON document committed WITH each version by the same
    # write-file-then-swap-pointer protocol the data uses: the meta
    # file is written (tmp + atomic replace) BEFORE the pointer swap,
    # so readers never see a version without its meta, and a crash
    # between the two leaves an orphan _META_v{n} with n > pointer
    # that exact-version resolution simply never reads (it is
    # overwritten by the next commit that takes version n, and GC-ed
    # by vacuum). This is what makes index sidecar state — e.g. the
    # IVF centroid set (operators/incremental_ann.py) — object-store
    # safe: no listdir-based resolution, no rmtree, no directory
    # beside the commit protocol (r7 verdict #1).

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.path, f"{_META_PREFIX}{version}.json")

    def read_meta(self, version: int | None = None) -> dict | None:
        """Meta payload of the CURRENT version (or, time-travel, of an
        explicit retained ``version``); None when the store is empty or
        the version carries no meta. An explicit unretained version
        raises, exactly like ``read()`` — a crash-orphan's meta above
        the pointer (e.g. centroids whose data never committed) must
        not be servable through the side door."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version} is not retained (have {self.versions()}); "
                "vacuum(keep=...) controls time-travel depth"
            )
        try:
            with open(self._meta_path(v)) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None

    def _commit_meta(self, version: int, meta: dict | None) -> None:
        """Write version ``version``'s meta before its pointer swap.
        ``meta=None`` carries the current version's meta forward (a
        merge/remove must not drop the index's sidecar state); a store
        with no prior meta writes nothing."""
        if meta is None:
            meta = self.read_meta()
            if meta is None:
                return
        tmp = self._meta_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(version))

    def _bucket_col(self, n: int | None = None) -> F.Column:
        return F.pmod(
            F.xxhash64(F.col(self.bucket_key)), F.lit(n or self.num_buckets)
        ).cast("int")

    def read_buckets(
        self, bucket_ids: list[int], version: int | None = None
    ) -> DataFrame | None:
        """Current snapshot (or, time-travel, an explicit retained
        ``version``) restricted to ``bucket_ids`` — a PRUNED read:
        untouched buckets' files are never opened, so the cost is
        proportional to the touched fraction of the table, not the
        table. This is the index-lookup read path (e.g. the MinHash
        band store probing only the buckets a batch's bands hash to)
        and the change-feed's per-version slice read.

        Hardlink layout: ``_bucket=N`` are partition directories, so a
        partition filter prunes at the source. Manifest layout: the
        manifest maps bucket -> files, so the file list itself is
        pruned before the reader ever runs."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        wanted = set(bucket_ids)
        if self.layout == "manifest":
            files = self._read_manifest(v)
            paths = [
                os.path.join(self._data_dir(), rel)
                for b, rels in files.items()
                if b in wanted
                for rel in rels
            ]
            if not paths:
                return self._empty_df()
            # _bucket is recomputed under the count THIS version was
            # written with (same rule as read() — a pruned time-travel
            # read across a rebucket boundary must label rows by its
            # own version's physical layout).
            cfg = self._read_cfg(v)
            # Legacy pre-_STORECFG versions were written under the
            # CONSTRUCTOR count (rebucket always records cfg, so a
            # cfg-less version's count never changed) — falling through
            # to the current version's count would mislabel rows after
            # a later rebucket.
            n = cfg.get("num_buckets") if cfg else self._default_buckets
            reader = self.spark.read.option("recursiveFileLookup", "true")
            pinned = self._pinned_schema(cfg)
            if pinned is not None:
                # Commit-time schema: no footer inference (r15).
                reader = reader.schema(pinned)
            return reader.parquet(*paths).withColumn(
                "_bucket", self._bucket_col(n)
            )
        return self._read_version(v).filter(F.col("_bucket").isin(list(wanted)))

    def _buckets_for_keys(self, keys: list) -> list[int]:
        """Which physical buckets the given key VALUES live in — the
        same xxhash64-pmod the writers applied, computed on the keys
        cast to the STORED column type (xxhash64 is type-sensitive:
        hashing a probe int against a column written as bigint would
        silently probe the wrong buckets)."""
        stored_t = self._schema_meta()["fields"].get(self.bucket_key)
        df = self.spark.createDataFrame(
            [(k,) for k in keys], f"`{self.bucket_key}` {stored_t}"
            if stored_t
            else None,
        )
        if stored_t is None:  # pre-schema store: trust the probe type
            df = df.toDF(self.bucket_key)
        rows = df.select(self._bucket_col().alias("b")).distinct().collect()
        return sorted(r.b for r in rows)

    def read_keys(self, keys: list) -> DataFrame | None:
        """Point lookup: the rows whose key is in ``keys``, touching
        only the buckets those keys hash to. At 100 TB this is the
        difference between opening a handful of files and scanning the
        table: bucket pruning cuts the file list to O(len(keys))
        buckets, the IN-predicate is pushed into the parquet scan
        (PushedFilters), and because the writers cluster each file by
        the bucket key (sortWithinPartitions), row-group min/max stats
        skip inside the surviving files too.

        CONTRACT: ``keys`` is a SMALL driver-side list (an operational
        lookup — "show me these documents"), not a join side; bulk key
        sets belong in a join against ``read()``. Requires
        ``bucket_key == key`` for the same reason merge(removed=...)
        does: values of the merge key can't be routed to buckets
        hashed on a different column."""
        if self.bucket_key != self.key:
            raise ValueError(
                "read_keys needs bucket_key == key: key values can't be "
                f"hashed to buckets keyed on {self.bucket_key!r}."
            )
        if self.current_version() is None:
            return None
        if not keys:
            return self._empty_df()
        df = self.read_buckets(self._buckets_for_keys(keys))
        return df.filter(F.col(self.key).isin(list(keys)))

    # -- change data feed ----------------------------------------------------
    def changed_buckets(self, v_from: int, v_to: int) -> list[int] | None:
        """Buckets whose PHYSICAL file set differs between two retained
        versions — resolved from metadata only (manifest file lists, or
        the hardlink layout's per-bucket file names: merge carries an
        untouched bucket forward under the SAME names, while a rewrite
        mints fresh task-UUID part names), no parquet opened. Returns
        None when the two versions were written under different bucket
        counts (a rebucket boundary) — bucket ids aren't comparable
        across layouts, so the change feed must diff every bucket."""
        nf = (self._read_cfg(v_from) or {}).get("num_buckets")
        nt = (self._read_cfg(v_to) or {}).get("num_buckets")
        if nf != nt:
            return None
        if self.layout == "manifest":
            mf, mt = self._read_manifest(v_from), self._read_manifest(v_to)
            return sorted(
                b
                for b in set(mf) | set(mt)
                if set(mf.get(b, ())) != set(mt.get(b, ()))
            )

        def listing(v: int) -> dict[int, set[str]]:
            out: dict[int, set[str]] = {}
            vdir = self._version_dir(v)
            if os.path.isdir(vdir):
                for entry in os.listdir(vdir):
                    if not entry.startswith("_bucket="):
                        continue
                    b = int(entry.split("=", 1)[1])
                    out[b] = {
                        f
                        for f in os.listdir(os.path.join(vdir, entry))
                        if not f.startswith((".", "_"))
                    }
            return out

        lf, lt = listing(v_from), listing(v_to)
        return sorted(
            b
            for b in set(lf) | set(lt)
            if lf.get(b, set()) != lt.get(b, set())
        )

    def _cfg_count(self, version: int) -> int:
        """Bucket count a retained version was written under (legacy
        cfg-less versions: the constructor seed — see read())."""
        return (self._read_cfg(version) or {}).get(
            "num_buckets", self._default_buckets
        )

    def _changed_bucket_groups(
        self, v_from: int, v_to: int
    ) -> dict[int, set[int]] | None:
        """Changed buckets between two retained versions, WALKED
        version-by-version so the feed survives rebucket boundaries:
        per adjacent retained pair, a same-count transition contributes
        its metadata-diffed buckets (under that count) and a pure
        rebucket — identified by the cfg's ``rebucket_from`` provenance
        tag — contributes nothing (same rows, new layout). Returns
        ``{bucket_count: {bucket, ...}}`` (possibly several counts when
        the window spans an evolution), ``{}`` when nothing changed,
        or None when a count change can't be proven pure (legacy
        rebucket, vacuumed intermediate) — the caller degrades to a
        full two-version diff, honestly."""
        path = [v for v in self.versions() if v_from <= v <= v_to]
        groups: dict[int, set[int]] = {}
        for a, b in zip(path, path[1:]):
            na, nb = self._cfg_count(a), self._cfg_count(b)
            if na == nb:
                ch = self.changed_buckets(a, b)
                if ch is None:  # pragma: no cover - counts equal above
                    return None
                if ch:
                    groups.setdefault(na, set()).update(ch)
            elif (self._read_cfg(b) or {}).get("rebucket_from") != a:
                return None
        return groups

    @staticmethod
    def _project_buckets(bs: set[int], n: int, n2: int) -> set[int] | None:
        """Map a bucket set under count ``n`` to the bucket set under
        count ``n2`` covering the SAME keys. Exact for divisible
        evolutions (pmod(h, n) determines pmod(h, n2) up to the listed
        expansions); None for incommensurable counts."""
        if n == n2:
            return set(bs)
        if n2 % n == 0:  # grow: each bucket splits into n2/n
            return {b + i * n for b in bs for i in range(n2 // n)}
        if n % n2 == 0:  # shrink: buckets collapse
            return {b % n2 for b in bs}
        return None

    def read_changes(
        self,
        v_from: int,
        v_to: int | None = None,
        *,
        update_images: str = "post",
    ) -> DataFrame:
        """Change data feed between two retained versions: one row per
        key whose state differs, labeled ``_change`` = 'insert' /
        'update' / 'delete' (post-image values for insert/update,
        pre-image for delete). This is what an incremental DOWNSTREAM
        consumer reads — "what did tonight's merge actually do" —
        without diffing two full snapshots.

        Cost is O(changed buckets), not O(table): the retained-version
        path is walked pair-by-pair (``_changed_bucket_groups``), each
        same-count transition resolves its touched buckets from commit
        metadata, a PURE REBUCKET transition (provenance-tagged by
        ``rebucket``) contributes zero, and the union — projected onto
        each endpoint's own bucket count for divisible evolutions —
        prunes the reads FROM EITHER VERSION, so the feed stays
        delta-bound even when the window spans a bucket-count
        evolution. When the projection crosses counts, both slices are
        additionally filtered to the exact candidate key set (the same
        xxhash64-pmod the writers applied) so a key sharing a
        coarse-count bucket with a changed key can never surface as a
        phantom insert/delete. A nightly merge that rewrites 1% of a
        100 TB store yields a change feed that reads ~2 TB (both
        versions' slices), never 200 TB. Only an UNPROVABLE count
        change (legacy rebucket with no tag, vacuumed intermediate
        version, non-divisible counts) degrades — honestly — to a full
        two-version diff. Row-level classification is exact —
        null-safe column comparison, not a hash — so a
        rewritten-but-identical row never surfaces as a phantom
        update. Reference parity: the scanner's new/modified/removed
        detection between consecutive scans (scanner.py:414-463),
        served here from the store's own commit metadata instead of a
        rescan."""
        if update_images not in ("post", "both"):
            raise ValueError(
                f"update_images must be 'post' or 'both', got {update_images!r}"
            )
        v_to = self.current_version() if v_to is None else v_to
        retained = self.versions()
        for v in (v_from, v_to):
            if v not in retained:
                raise ValueError(
                    f"version {v} is not retained (have {retained}); "
                    "vacuum(keep=...) controls change-feed depth"
                )
        if v_from > v_to:
            raise ValueError(f"v_from {v_from} > v_to {v_to}")
        keys = [self.key] if isinstance(self.key, str) else list(self.key)
        if v_from == v_to:
            return (
                self._empty_df()
                .drop("_bucket")
                .withColumn("_change", F.lit("").cast("string"))
            )
        groups = self._changed_bucket_groups(v_from, v_to)
        nf, nt = self._cfg_count(v_from), self._cfg_count(v_to)
        old_b: set[int] | None = set()
        new_b: set[int] | None = set()
        if groups is not None:
            for n, bs in groups.items():
                po = self._project_buckets(bs, n, nf)
                pn = self._project_buckets(bs, n, nt)
                if po is None or pn is None:
                    groups = None  # incommensurable counts → full diff
                    break
                old_b |= po
                new_b |= pn
        if groups is not None and not groups:
            old = new = self._empty_df()
        elif groups is None:
            old, new = self.read(v_from), self.read(v_to)
        else:
            old = self.read_buckets(sorted(old_b), version=v_from)
            new = self.read_buckets(sorted(new_b), version=v_to)
            if set(groups) != {nf} or nf != nt:
                # The projection crossed bucket counts, so each slice
                # covers a SUPERSET of the candidate keys (a coarse
                # bucket holds several fine ones). Filter both sides to
                # the exact candidate set — the same hash the writers
                # bucketed by — or an untouched cohabitant key would
                # appear in one slice only and classify as a phantom
                # insert/delete.
                member = None
                for n, bs in groups.items():
                    clause = self._bucket_col(n).isin(sorted(bs))
                    member = clause if member is None else (member | clause)
                old = old.filter(member)
                new = new.filter(member)
        # Align on the union schema (a diff across a schema-evolution
        # boundary compares added columns as typed NULLs).
        old, new = self._migrate(
            old.drop("_bucket"), new.drop("_bucket")
        )
        return classify_changes(old, new, keys, update_images=update_images)

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
        keys = [self.key] if isinstance(self.key, str) else list(self.key)
        if any(k not in new_types for k in keys) or self.version_col not in new_types:
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

    # -- manifest layout ----------------------------------------------------
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"_MANIFEST_v{version}.json")

    def _read_manifest(self, version: int) -> dict[int, list[str]]:
        with open(self._manifest_path(version)) as f:
            return {int(k): v for k, v in json.load(f)["files"].items()}

    def _write_manifest(self, version: int, files: dict[int, list[str]]) -> None:
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "files": {str(k): sorted(v) for k, v in files.items()}},
                f,
                indent=1,
            )
        os.replace(tmp, self._manifest_path(version))  # the atomic commit

    def _list_data_files(self) -> set[str]:
        """All parquet data files under data/, as manifest relpaths.
        Handles both on-disk shapes: ``<commit>/_bucket=N/file``
        (current) and ``_bucket=N/file`` (stores written before commit
        directories existed)."""
        out: set[str] = set()
        data = self._data_dir()
        if not os.path.isdir(data):
            return out
        for root, _dirs, fnames in os.walk(data):
            if not os.path.basename(root).startswith("_bucket="):
                continue
            rel_root = os.path.relpath(root, data)
            for fname in fnames:
                if not fname.startswith((".", "_")):
                    out.add(f"{rel_root}/{fname}")
        return out

    def _write_data_files(self, df: DataFrame) -> dict[int, list[str]]:
        """Write ``df`` bucketed on the key into a FRESH UUID commit
        directory under data/; return the created files per bucket.

        Attribution is by path — the commit directory belongs
        exclusively to this write — so a concurrent writer's or a
        crashed write's stray part files can never be folded into this
        commit's manifest (the previous before/after listing diff
        claimed any file that appeared during the write). This is the
        same files-then-metadata commit shape Iceberg/Delta use."""
        import uuid

        commit = uuid.uuid4().hex[:16]
        out = os.path.join(self._data_dir(), commit)
        # Clustered like _write_buckets: key-sorted row groups give
        # read_keys row-group skipping on top of bucket pruning.
        (
            df.withColumn("_bucket", self._bucket_col())
            .repartition(self.num_buckets, "_bucket")
            .sortWithinPartitions("_bucket", self.bucket_key)
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(out)
        )
        files: dict[int, list[str]] = {}
        for b in os.listdir(out):
            bd = os.path.join(out, b)
            if not b.startswith("_bucket=") or not os.path.isdir(bd):
                continue
            bucket = int(b.split("=", 1)[1])
            for fname in os.listdir(bd):
                if not fname.startswith((".", "_")):
                    files.setdefault(bucket, []).append(f"{commit}/{b}/{fname}")
        return files

    def _empty_df(self) -> DataFrame:
        """Typed empty snapshot from the recorded schema — the read
        path for a table whose rows were all deleted (no parquet files
        left to infer a schema from)."""
        fields = self._schema_meta()["fields"]
        ddl = ", ".join(f"`{n}` {t}" for n, t in fields.items())
        ddl = f"{ddl}, `_bucket` int" if ddl else "`_bucket` int"
        return self.spark.createDataFrame([], ddl)

    # -- read / write -------------------------------------------------------
    def _versions_on_disk(self) -> list[int]:
        """Raw version artifacts present (ascending), INCLUDING crash
        orphans above the pointer — vacuum's GC input."""
        if self.layout == "manifest":
            return sorted(
                int(name[len("_MANIFEST_v") : -len(".json")])
                for name in os.listdir(self.path)
                if name.startswith("_MANIFEST_v") and name.endswith(".json")
            )
        return sorted(
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit()
        )

    def versions(self) -> list[int]:
        """All RETAINED COMMITTED versions (ascending) — what
        read(version=...) can time-travel to; vacuum shrinks this
        list. Artifacts ABOVE the pointer are excluded: a crashed
        write leaves its partial version dir/manifest orphaned there,
        and exposing it as "retained" would serve a half-written
        snapshot (same rule as meta resolution)."""
        cur = self.current_version()
        if cur is None:
            return []
        return [v for v in self._versions_on_disk() if v <= cur]

    def read(self, version: int | None = None) -> DataFrame | None:
        """The current snapshot — or, time-travel, an explicit retained
        ``version`` (versions are immutable; ``versions()`` lists what
        vacuum has kept). Raises ValueError for a version vacuum has
        already dropped, instead of a deep-plan file-not-found."""
        v = self.current_version() if version is None else version
        if v is None:
            return None
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version} is not retained (have {self.versions()}); "
                "vacuum(keep=...) controls time-travel depth"
            )
        if self.layout == "manifest":
            files = self._read_manifest(v)
            paths = [
                os.path.join(self._data_dir(), rel)
                for rels in files.values()
                for rel in rels
            ]
            if not paths:
                return self._empty_df()
            # recursiveFileLookup disables partition inference (commit
            # dirs between data/ and _bucket= would otherwise trip
            # CONFLICTING_DIRECTORY_STRUCTURES); _bucket is derivable
            # from the key, so recompute it instead of inferring —
            # under the count THIS version was written with (a
            # time-travel read across a rebucket boundary must label
            # rows by its own version's physical layout).
            cfg = self._read_cfg(v)
            # Same legacy-count rule as read_buckets above.
            n = cfg.get("num_buckets") if cfg else self._default_buckets
            reader = self.spark.read.option("recursiveFileLookup", "true")
            pinned = self._pinned_schema(cfg)
            if pinned is not None:
                # Schema recorded at commit time: skip the per-call
                # footer-inference round trip (r15 optimization).
                reader = reader.schema(pinned)
            return reader.parquet(*paths).withColumn(
                "_bucket", self._bucket_col(n)
            )
        return self._read_version(v)

    def _read_version(self, v: int) -> DataFrame:
        """Hardlink-layout read of one version dir, falling back to the
        recorded schema when the version holds no bucket files (a merge
        whose removals emptied the table writes no parquet)."""
        vdir = self._version_dir(v)
        has_buckets = os.path.isdir(vdir) and any(
            e.startswith("_bucket=") for e in os.listdir(vdir)
        )
        if not has_buckets:
            return self._empty_df()
        pinned = self._pinned_schema(self._read_cfg(v))
        if pinned is not None:
            # Commit-time schema + the _bucket partition column (its
            # values come from the _bucket=N directory names, as with
            # inference — int, matching the writer's cast): no footer
            # inference per read (r15).
            from pyspark.sql.types import IntegerType, StructField

            full = pinned.add(StructField("_bucket", IntegerType()))
            return self.spark.read.schema(full).parquet(vdir)
        return self.spark.read.parquet(vdir)

    def _write_buckets(self, df: DataFrame, out: str) -> None:
        # sortWithinPartitions clusters each written file's row groups
        # by the bucket key: parquet min/max stats become tight, so a
        # later key-predicate read (read_keys) skips row groups inside
        # the pruned bucket too. In-partition sort — no extra shuffle.
        (
            df.withColumn("_bucket", self._bucket_col())
            .repartition(self.num_buckets, "_bucket")
            .sortWithinPartitions("_bucket", self.bucket_key)
            .write.mode("append")
            .partitionBy("_bucket")
            .parquet(out)
        )

    def overwrite(
        self,
        df: DataFrame,
        *,
        meta: dict | None = None,
        expected_base: int | None | type(...) = ...,
    ) -> int:
        """Commit ``df`` as a full new version. ``expected_base`` is
        the optimistic-concurrency token: the version this write's
        DATA BASIS was read from. When the caller derived ``df`` from
        an earlier read (merge's schema-migration path, rebucket, an
        index re-seed), passing that version makes the transaction
        re-check verify the pointer against the true basis — a commit
        that landed in between raises ConcurrentWriteError instead of
        being silently folded over (lost update). Omitted, the base is
        the pointer read here, which is only sound when ``df`` does
        not depend on current store contents."""
        if expected_base is ...:
            expected_base = self.current_version()
        df = df.drop("_bucket")
        with self._txn(expected_base) as v:
            if self.layout == "manifest":
                self._write_manifest(v, self._write_data_files(df))
            else:
                out = self._version_dir(v)
                shutil.rmtree(out, ignore_errors=True)
                self._write_buckets(df, out)
            self._record_schema(df)
            self._write_identity()
            self._commit_cfg(v, schema=df.schema)
            self._commit_meta(v, meta)
            self._swap_pointer(v)
        return v

    def _version_data_files(self, v: int) -> list[str]:
        """ABSOLUTE paths of version ``v``'s data files, both layouts —
        the single listing history() and duckdb_file.store_scan_sql
        share (bucket_stats keeps its own per-bucket-keyed shape)."""
        if self.layout == "manifest":
            return sorted(
                os.path.abspath(os.path.join(self._data_dir(), rel))
                for rels in self._read_manifest(v).values()
                for rel in rels
            )
        vdir = self._version_dir(v)
        return sorted(
            os.path.abspath(os.path.join(root, fn))
            for root, _dirs, fnames in os.walk(vdir)
            if os.path.basename(root).startswith("_bucket=")
            for fn in fnames
            if not fn.startswith((".", "_"))
        )

    def history(self) -> list[dict]:
        """Commit log of the retained versions (ascending) — the
        DESCRIBE HISTORY surface: per version, when it committed, the
        bucket count it was written under, its physical file count and
        bytes, and whether it carries a meta payload (index sidecar
        state). Metadata-only — manifests / directory listings, no
        parquet opened — so it is cheap enough for an operator
        dashboard to poll. ``committed_at`` is None for versions
        written before timestamps were recorded."""
        out: list[dict] = []
        cur = self.current_version()
        for v in self.versions():
            cfg = self._read_cfg(v) or {}
            files, size = 0, 0
            for f in self._version_data_files(v):
                try:
                    size += os.path.getsize(f)
                    files += 1
                except OSError:
                    pass
            out.append(
                {
                    "version": v,
                    "committed_at": cfg.get("committed_at"),
                    "num_buckets": cfg.get("num_buckets"),
                    "n_files": files,
                    "bytes": size,
                    "has_meta": os.path.exists(self._meta_path(v)),
                    "is_current": v == cur,
                }
            )
        return out

    def bucket_stats(self) -> dict | None:
        """Physical balance of the CURRENT version — per-bucket file
        count and bytes — from METADATA only (the manifest's file list
        or the version dir's listing; no parquet is read). Driver-side
        O(files), bounded by buckets x retained-files-per-bucket.
        None on an empty store.

        This is the measurement half of bucket evolution: a nightly
        pipeline reads these numbers to decide when ``rebucket`` (or
        the ``maybe_rebucket`` policy) should fire, and the max/avg
        ratio exposes hash skew on the bucket key."""
        v = self.current_version()
        if v is None:
            return None
        per: dict[int, dict] = {}
        if self.layout == "manifest":
            for b, rels in self._read_manifest(v).items():
                files, size = 0, 0
                for rel in rels:
                    try:
                        size += os.path.getsize(os.path.join(self._data_dir(), rel))
                        files += 1
                    except OSError:
                        pass
                per[b] = {"files": files, "bytes": size}
        else:
            vdir = self._version_dir(v)
            if os.path.isdir(vdir):
                for entry in os.listdir(vdir):
                    if not entry.startswith("_bucket="):
                        continue
                    b = int(entry.split("=", 1)[1])
                    files, size = 0, 0
                    bd = os.path.join(vdir, entry)
                    for fname in os.listdir(bd):
                        if fname.startswith((".", "_")):
                            continue
                        try:
                            size += os.path.getsize(os.path.join(bd, fname))
                            files += 1
                        except OSError:
                            pass
                    per[b] = {"files": files, "bytes": size}
        total = sum(d["bytes"] for d in per.values())
        n = self.num_buckets
        return {
            "version": v,
            "num_buckets": n,
            "buckets": per,
            "total_bytes": total,
            "avg_bucket_bytes": total / n if n else 0.0,
            "max_bucket_bytes": max((d["bytes"] for d in per.values()), default=0),
        }

    def maybe_rebucket(
        self,
        *,
        target_bucket_bytes: int,
        max_buckets: int = 1 << 20,
        meta: dict | None = None,
    ) -> int | None:
        """Evolution POLICY on top of the ``rebucket`` mechanism: when
        the current version's AVERAGE bucket exceeds
        ``target_bucket_bytes``, grow the count to the next power of
        two that brings the average back under target (capped at
        ``max_buckets``), in one committed rewrite. Returns the new
        version, or None when no evolution was needed.

        Sized for the nightly cycle: the check itself is metadata-only
        (``bucket_stats``), so calling this every cycle costs nothing
        until the corpus actually outgrows its layout — at which point
        one O(table) rewrite amortizes against every subsequent
        merge's smaller rewrite unit. Average (not max) drives the
        decision: a hot BUCKET with an average-sized table signals key
        skew, which more buckets dilute only by the skewed key's
        multiplicity — that is salting's job, not evolution's."""
        stats = self.bucket_stats()
        if stats is None or stats["avg_bucket_bytes"] <= target_bucket_bytes:
            return None
        need = -(-stats["total_bytes"] // target_bucket_bytes)  # ceil
        n = self.num_buckets
        while n < need and n < max_buckets:
            n *= 2
        n = min(n, max_buckets)
        if n <= self.num_buckets:
            return None
        return self.rebucket(n, meta=meta)

    def rebucket(self, num_buckets: int, *, meta: dict | None = None) -> int | None:
        """Evolve the physical bucket count — the partition-evolution
        operation a growing corpus needs: a store seeded at 32 buckets
        serves a 100 GB index fine, but at 100 TB each touched bucket
        is a ~3 TB rewrite per nightly merge; growing the count shrinks
        the per-delta rewrite unit without re-seeding the index.

        One O(table) rewrite committed as a NORMAL version: data files
        are written under the new hashing, the version's _STORECFG
        records the new count (before the pointer swap), and the
        pointer swap publishes both atomically. Crash before the swap
        leaves orphans the next commit overwrites and vacuum GCs;
        ``rollback`` across a rebucket boundary restores the OLD count
        automatically because the count is resolved from the version
        the pointer names. Meta (index sidecar state, e.g. IVF
        centroids) is carried forward unless ``meta`` overrides it.

        On an EMPTY store this just re-seeds the default for the first
        commit and returns None."""
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        cur_v = self.current_version()
        if cur_v is None:
            self._default_buckets = num_buckets
            return None
        if num_buckets == self.num_buckets:
            return cur_v
        cur = self.read().drop("_bucket")
        self._pinned_buckets = num_buckets
        self._rebucket_base = cur_v
        try:
            # The rewrite is derived from cur_v: a racing commit since
            # that read raises instead of being rebucketed away.
            v = self.overwrite(cur, meta=meta, expected_base=cur_v)
        finally:
            self._pinned_buckets = None
            self._rebucket_base = None
        return v

    def merge(
        self,
        batch: DataFrame,
        removed: DataFrame | None = None,
        *,
        meta: dict | None = None,
        expected_base: int | None | type(...) = ...,
    ) -> int:
        """Newer-wins upsert of a batch into the current snapshot
        (the reference's ON CONFLICT ... WHERE excluded newer), plus
        optional key deletions (the reference's DELETE ... NOT IN,
        scanner.py:447-454), joining and rewriting ONLY the buckets the
        batch or the removals touch; untouched bucket files are
        hard-linked into the new version.

        ``removed`` is a one-column DataFrame of keys to delete.
        Removals land in the same buckets their keys hash to, so the
        incremental pipeline's steady-state cycle (upserts + deletes)
        stays O(delta) instead of O(table).

        CONTRACT: the batch is expected to be DELTA-sized (the join
        builds an in-memory hash map on it per partition — see
        upsert_newer_wins' delta_batch precondition). A table-sized
        rewrite belongs in overwrite(), not merge().

        ``removed`` requires ``bucket_key == key`` (the default): a
        one-column key list can't be routed to buckets hashed on a
        DIFFERENT column, so for an index store (e.g. the MinHash band
        store, bucketed on the band hash) keyed deletion has no pruned
        path — use the store's own full-pass removal
        (MinHashBandStore.remove_docs) instead. Raising here beats the
        AnalysisException the bucket derivation would otherwise throw
        from deep inside the plan (r7 review finding)."""
        if removed is not None and self.bucket_key != self.key:
            raise ValueError(
                "merge(removed=...) needs bucket_key == key: removal keys "
                f"can't be hashed to buckets keyed on {self.bucket_key!r}. "
                "Use an explicit full-pass removal for index stores."
            )
        cur_v = self.current_version()
        # ``expected_base``: same optimistic-concurrency token as
        # overwrite's — a caller whose BATCH depends on state it
        # validated at a specific version (e.g. IVF assignment against
        # that version's centroid meta) pins the commit to it; the
        # _txn pointer re-check below then makes the validation exact
        # (no window between validate and claim). merge's own data
        # basis is always the pointer read here, so a mismatch aborts
        # before any work.
        if expected_base is not ... and cur_v != expected_base:
            raise ConcurrentWriteError(
                f"pointer of {self.path} is at {cur_v}, but this merge's "
                f"batch was validated against {expected_base}; re-derive "
                "and retry"
            )
        batch = batch.drop("_bucket")
        if cur_v is None:
            if removed is not None:
                batch = batch.join(
                    removed.select(F.col(removed.columns[0]).alias(self.key)),
                    on=self.key,
                    how="left_anti",
                )
            # expected_base pins the txn to the emptiness this path
            # relied on: a seed that raced in raises instead of being
            # overwritten.
            return self.overwrite(batch, meta=meta, expected_base=None)

        if self.needs_schema_update(batch):
            # Schema drift → migrate: one O(table) rewrite under the
            # union schema (rare; mirrors the reference's
            # copy-into-new-table), then normal pruned merges resume.
            current, batch = self._migrate(self.read().drop("_bucket"), batch)
            merged = upsert_newer_wins(
                current,
                batch,
                self.key,
                self.version_col,
                dedup_current=self.dedup_current,
            )
            if removed is not None:
                merged = merged.join(
                    removed.select(F.col(removed.columns[0]).alias(self.key)),
                    on=self.key,
                    how="left_anti",
                )
            # The rewrite was derived from the cur_v read above —
            # expected_base makes a commit that slipped in since then
            # a ConcurrentWriteError, not a silent fold-over.
            return self.overwrite(merged, meta=meta, expected_base=cur_v)

        # Claim the commit BEFORE the merge compute (via _txn, which
        # also re-verifies the pointer under the claim): a racing
        # writer fails fast here, not after minutes of shuffle.
        with self._txn(cur_v) as v:
            return self._merge_committed(batch, removed, cur_v, v, meta)

    def _merge_committed(
        self,
        batch: DataFrame,
        removed: DataFrame | None,
        cur_v: int,
        v: int,
        meta: dict | None,
    ) -> int:
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

        if self.layout == "manifest":
            # Write the merged touched buckets as NEW data files, then
            # commit a manifest that points untouched buckets at their
            # EXISTING files — no link/rename/copy, object-store safe.
            cur_files = self._read_manifest(cur_v)
            new_files: dict[int, list[str]] = {}
            if touched:
                paths = [
                    os.path.join(self._data_dir(), rel)
                    for b in touched
                    for rel in cur_files.get(b, [])
                ]
                cur_touched = (
                    self.spark.read.option("recursiveFileLookup", "true")
                    .parquet(*paths)
                    .drop("_bucket")
                    if paths
                    else self._empty_df().drop("_bucket")
                )
                merged = upsert_newer_wins(
                    cur_touched,
                    batch.drop("_bucket"),
                    self.key,
                    self.version_col,
                    dedup_current=self.dedup_current,
                )
                if removed is not None:
                    merged = merged.join(
                        removed.select(self.key), on=self.key, how="left_anti"
                    )
                new_files = self._write_data_files(merged)
            batch.unpersist()
            if removed is not None:
                removed.unpersist()
            manifest = {
                b: rels for b, rels in cur_files.items() if b not in set(touched)
            }
            manifest.update(new_files)
            self._write_manifest(v, manifest)
            self._write_identity()
            # Touched buckets were rewritten under the batch's schema;
            # untouched files carry the same one (drift took the
            # migrate/overwrite path above), so the batch schema IS the
            # version's schema.
            self._commit_cfg(v, schema=batch.schema)
            self._commit_meta(v, meta)
            self._swap_pointer(v)
            return v

        cur_dir = self._version_dir(cur_v)
        out = self._version_dir(v)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)

        if touched:
            # Merge only the touched buckets (partition pruning on the
            # _bucket directory column keeps the read proportional to
            # the batch, not the table).
            cur_touched = (
                self._read_version(cur_v)
                .filter(F.col("_bucket").isin(touched))
                .drop("_bucket")
            )
            merged = upsert_newer_wins(
                cur_touched,
                batch.drop("_bucket"),
                self.key,
                self.version_col,
                dedup_current=self.dedup_current,
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
        self._write_identity()
        # Same-schema rule as the manifest path: drift took the
        # migrate/overwrite branch, so the batch schema is the
        # version's file schema.
        self._commit_cfg(v, schema=batch.schema)
        self._commit_meta(v, meta)
        self._swap_pointer(v)
        return v

    def merge_with_retry(
        self,
        batch: DataFrame,
        removed: DataFrame | None = None,
        *,
        meta: dict | None = None,
        max_retries: int = 5,
        backoff_s: float = 0.05,
    ) -> int:
        """``merge`` with a bounded optimistic rebase-and-retry loop —
        the multi-writer path for COMMUTABLE commits.

        The fail-fast single-writer contract stays the store's default
        (and the only safe mode for overwrite/rebucket, whose result
        depends on the exact base state). A newer-wins merge, though,
        COMMUTES with other merges: whichever writer lands first, the
        final state per key is the row with the greatest version_col
        (ties keep the incumbent — the one order-dependent edge, same
        as the reference's strictly-newer upsert predicate). So when
        two legitimate jobs collide (nightly merge vs ad-hoc
        backfill), the loser can simply REBASE: re-read the pointer —
        ``merge`` re-reads it on entry — and re-apply its delta on top
        of the winner's commit.

        DELETIONS are the caveat: ``removed`` applies as an
        unconditional anti-join, so a rebased retry re-applies a
        possibly-STALE delete over a row a concurrent winner just
        upserted newer — delete does not commute with a newer upsert
        of the same key. Pass ``removed`` here only when the racing
        writers' key sets are disjoint (e.g. each job owns a key
        range) or delete-wins is the intended semantics; otherwise
        keep removal-carrying commits on the fail-fast ``merge`` so
        the loser re-derives its removal set against the fresh state
        (what ``pipeline.run_pipeline`` does).

        Each attempt is all-or-nothing (the claim + pointer re-check
        happen before any data is written), so a retry can never
        double-apply. Exponential backoff with deterministic
        per-attempt jitter (hash of pid+attempt — no wall-clock
        randomness) de-synchronizes herds. Raises the last
        ConcurrentWriteError after ``max_retries`` rebases — a
        persistent collision means the deployment needs a queue, not
        more retries."""
        return retry_concurrent(
            lambda: self.merge(batch, removed, meta=meta),
            max_retries=max_retries,
            backoff_s=backoff_s,
        )

    def rollback(self, version: int) -> int:
        """Point the store back at a retained ``version`` and drop the
        newer versions — the bad-ingest-night recovery: one pointer
        swap, no data movement (versions are immutable), and the dead
        branch above the rollback point is garbage-collected so a
        subsequent commit reuses its numbers cleanly.

        The pointer swap IS the rollback (atomic, crash-safe); the
        branch cleanup after it is idempotent housekeeping — a crash
        mid-cleanup leaves stale higher versions that the next
        rollback/vacuum removes, while readers already see the rolled
        -back state."""
        if version not in self.versions():
            raise ValueError(
                f"version {version} is not retained (have {self.versions()})"
            )
        self._swap_pointer(version)
        # Dead branches sit ABOVE the new pointer, so list raw disk
        # artifacts — versions() deliberately filters them out now.
        for v in self._versions_on_disk():
            if v <= version:
                continue
            if self.layout == "manifest":
                try:
                    os.remove(self._manifest_path(v))
                except OSError:
                    pass
            else:
                shutil.rmtree(self._version_dir(v), ignore_errors=True)
        self._vacuum_meta([])  # drops meta above the (new) pointer
        if self.layout == "manifest":
            self._gc_unreferenced_data()
        return version

    def _gc_unreferenced_data(self) -> None:
        """Manifest layout: delete data files no surviving manifest
        references, then prune emptied commit/bucket dirs (shared by
        vacuum and rollback)."""
        referenced: set[str] = set()
        for v in self.versions():
            for rels in self._read_manifest(v).values():
                referenced.update(rels)
        for rel in self._list_data_files() - referenced:
            try:
                os.remove(os.path.join(self._data_dir(), rel))
            except OSError:
                pass
        # rmdir is attempted UNCONDITIONALLY (bottom-up): os.walk's
        # `dirs` list is a pre-deletion snapshot, so a commit dir
        # whose bucket children were rmdir'd earlier in this same
        # walk still shows them and a `not dirs` guard would skip
        # it forever (empty commit dirs then accumulate across
        # vacuums). rmdir itself refuses non-empty dirs, so this
        # can never remove live data.
        for root, _dirs, _fnames in os.walk(self._data_dir(), topdown=False):
            if root != self._data_dir():
                try:
                    os.rmdir(root)
                except OSError:
                    pass

    def _vacuum_meta(self, victims: list[int]) -> None:
        """Drop victims' meta AND config sidecars plus crash orphans
        (n > current — a commit that wrote its sidecars but died
        before the pointer swap)."""
        cur = self.current_version() or 0
        doomed = set(victims)
        for name in os.listdir(self.path):
            prefix = next(
                (p for p in (_META_PREFIX, _CFG_PREFIX) if name.startswith(p)),
                None,
            )
            if prefix is None or not name.endswith(".json"):
                continue
            try:
                n = int(name[len(prefix) : -len(".json")])
            except ValueError:
                continue
            if n in doomed or n > cur:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def vacuum(
        self,
        keep: int = 2,
        *,
        max_age_s: float | None = None,
        now: float | None = None,
    ) -> list[int]:
        """Drop all but the newest ``keep`` versions (never the
        current one). Manifest layout additionally deletes data files
        no surviving manifest references.

        ``max_age_s`` adds AGE-based retention on top of the count
        bound: any non-current version whose recorded ``committed_at``
        is older than ``now - max_age_s`` is dropped even if it is
        inside the newest ``keep`` — the "retain 7 days of time
        travel" policy a nightly pipeline states in hours, not
        version counts. Versions written before timestamps were
        recorded have no age and are never age-expired (conservative;
        the count bound still applies). ``now`` defaults to the wall
        clock; tests inject it."""
        import time as _time

        cur = self.current_version()
        # Crash orphans above the pointer (a failed write's partial
        # version) are unconditionally GC-ed — they are unreadable by
        # contract (versions() excludes them) and a later commit would
        # overwrite their numbers anyway.
        for v in self._versions_on_disk():
            if v > (cur or 0):
                if self.layout == "manifest":
                    try:
                        os.remove(self._manifest_path(v))
                    except OSError:
                        pass
                else:
                    shutil.rmtree(self._version_dir(v), ignore_errors=True)
        versions = self.versions()
        doomed = {
            v for v in (versions[:-keep] if keep > 0 else versions) if v != cur
        }
        if max_age_s is not None:
            cutoff = (now if now is not None else _time.time()) - max_age_s
            for v in versions:
                if v == cur:
                    continue
                ts = (self._read_cfg(v) or {}).get("committed_at")
                if ts is not None and ts < cutoff:
                    doomed.add(v)
        victims = sorted(doomed)
        if self.layout == "manifest":
            for v in victims:
                os.remove(self._manifest_path(v))
            self._gc_unreferenced_data()
            self._vacuum_meta(victims)
            return victims
        for v in victims:
            shutil.rmtree(self._version_dir(v), ignore_errors=True)
        self._vacuum_meta(victims)
        return victims
