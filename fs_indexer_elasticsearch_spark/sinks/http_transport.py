"""HTTP transports for the ES bulk/delete and Kibana saved-objects
sinks — injectable-session clients with retry/backoff.

Reference parity: elasticsearch_integration.py:20-30 (client built
with retry_on_timeout + max_retries=3), 420-451 (bulk send and
per-item success/failure counting), 526-551 (delete_by_query in
1000-id batches with conflicts=proceed + refresh);
kibana_data_views.py:245-313 (saved-objects _import with the
kbn-xsrf header and overwrite=true).

No ES/Kibana server (and no `requests`) exists in this image, so the
wire layer is one tiny injectable protocol:

    session(method, url, headers, body: bytes) -> (status: int, text: str)

`UrllibSession` implements it over the stdlib for real deployments;
tests inject recording/flaky fakes — the same seam the reference's
mode-matrix tests patch (tests/test_configuration_modes.py:188-351).

Scale note: these clients are DRIVER-side shippers for the NDJSON the
distributed sinks already wrote (one part file per Spark partition =
one bulk request). On a real cluster, prefer the elasticsearch-spark
connector (sinks/es_bulk.write_elasticsearch) so executors ship their
own partitions; this module is the connector-less fallback and the
unit-testable behavior spec of the wire protocol.
"""

from __future__ import annotations

import glob
import json
import os
import time
from collections.abc import Callable, Iterable

Session = Callable[[str, str, dict[str, str], bytes], tuple[int, str]]

_RETRYABLE = {429, 502, 503, 504}


class TransportError(Exception):
    """Raised when a request still fails after all retries."""


def urllib_session(timeout: float = 30.0) -> Session:
    """Stdlib-only default session (the reference uses `requests` /
    the elasticsearch client; both are absent here)."""

    def send(method: str, url: str, headers: dict[str, str], body: bytes):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:  # HTTP status errors carry a body
            return e.code, e.read().decode("utf-8", "replace")

    return send


class _RetryingClient:
    def __init__(
        self,
        base_url: str,
        session: Session | None = None,
        *,
        max_retries: int = 3,
        backoff_base: float = 0.1,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.session = session or urllib_session()
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.sleep = sleep

    def _request(
        self, method: str, path: str, body: bytes, headers: dict[str, str]
    ) -> tuple[int, str]:
        """Send with exponential backoff on transport faults and
        retryable statuses (429/5xx) — elasticsearch_integration.py's
        retry_on_timeout + max_retries=3, made explicit."""
        url = f"{self.base_url}{path}"
        last: str | None = None
        for attempt in range(self.max_retries + 1):
            try:
                status, text = self.session(method, url, headers, body)
            except Exception as e:  # noqa: BLE001 - network faults retry
                last = repr(e)
            else:
                if status not in _RETRYABLE:
                    return status, text
                last = f"HTTP {status}: {text[:200]}"
            if attempt < self.max_retries:
                self.sleep(self.backoff_base * (2**attempt))
        raise TransportError(f"{method} {url} failed after {self.max_retries + 1} tries: {last}")


class EsClient(_RetryingClient):
    """Minimal Elasticsearch REST client over the injectable session."""

    def bulk_lines(self, lines: Iterable[str], *, refresh: bool = True) -> tuple[int, int]:
        """POST one `_bulk` body; returns (success, failure) counted
        per item like the reference (statuses 200/201 are success,
        elasticsearch_integration.py:426-443)."""
        body = "\n".join(lines)
        if not body:
            return (0, 0)
        status, text = self._request(
            "POST",
            f"/_bulk?refresh={'true' if refresh else 'false'}",
            (body + "\n").encode(),
            {"Content-Type": "application/x-ndjson"},
        )
        if status != 200:
            raise TransportError(f"_bulk returned HTTP {status}: {text[:200]}")
        ok = failed = 0
        for item in json.loads(text).get("items", []):
            op = item.get("index") or item.get("delete") or {}
            if op.get("status") in (200, 201):
                ok += 1
            else:
                failed += 1
        return ok, failed

    #: Action-line prefixes emitted by sinks/es_bulk.py. index/create/
    #: update actions are followed by ONE source line; delete stands
    #: alone. Chunking must split only at action boundaries or a body
    #: would end with an orphaned action line and ES would reject it.
    _PAIRED_ACTIONS = ('{"index":', '{"create":', '{"update":')
    _SINGLE_ACTIONS = ('{"delete":',)

    def ship_bulk_dir(
        self,
        bulk_dir: str,
        *,
        batch_docs: int = 100_000,
        max_bytes: int = 80 * 1024 * 1024,
    ) -> tuple[int, int]:
        """Ship a write_bulk_file() output directory, re-chunked so no
        single `_bulk` request exceeds ``batch_docs`` documents or
        ``max_bytes`` of body. A part file is one Spark partition —
        at table scale that is table_size/num_buckets bytes, far past
        Elasticsearch's http.max_content_length (100 MB default), and
        an oversized request 413s non-retryably (the reference batches
        at bulk_size=100k for exactly this reason, config.es_bulk_size
        maps to ``batch_docs``). Chunks split only at action-line
        boundaries so index/create/update pairs never straddle
        requests."""
        ok = failed = 0
        chunk: list[str] = []
        docs = size = 0

        def flush() -> None:
            nonlocal ok, failed, chunk, docs, size
            if chunk:
                o, x = self.bulk_lines(chunk)
                ok += o
                failed += x
            chunk, docs, size = [], 0, 0

        for part in sorted(glob.glob(os.path.join(bulk_dir, "part-*"))):
            with open(part, encoding="utf-8") as f:
                lines = [ln for ln in f.read().split("\n") if ln]
            i = 0
            while i < len(lines):
                action = lines[i]
                unit = [action]
                if action.startswith(self._PAIRED_ACTIONS) and i + 1 < len(lines):
                    unit.append(lines[i + 1])
                elif not action.startswith(
                    self._SINGLE_ACTIONS + self._PAIRED_ACTIONS
                ):
                    # Defensive: a line we can't classify ships alone in
                    # order, preserving the body byte-for-byte.
                    pass
                i += len(unit)
                # Budget in UTF-8 BYTES, not code points: ES enforces
                # http.max_content_length on the wire body, and CJK-heavy
                # paths/text expand ~3x on encode — a code-point budget
                # would reintroduce the non-retryable 413 this
                # re-chunking exists to prevent (r6 advice).
                unit_size = sum(len(u.encode("utf-8")) + 1 for u in unit)
                if chunk and (docs >= batch_docs or size + unit_size > max_bytes):
                    flush()
                chunk.extend(unit)
                docs += 1
                size += unit_size
        flush()
        return ok, failed

    def delete_by_ids(
        self, index: str, ids: list[str], *, batch_size: int = 1000
    ) -> int:
        """`_delete_by_query` with a terms filter in 1000-id batches
        (elasticsearch_integration.py:526-551): conflicts=proceed,
        refresh, sums `deleted` across batches."""
        deleted = 0
        for i in range(0, len(ids), batch_size):
            body = json.dumps({"query": {"terms": {"id": ids[i : i + batch_size]}}})
            status, text = self._request(
                "POST",
                f"/{index}/_delete_by_query?conflicts=proceed&refresh=true",
                body.encode(),
                {"Content-Type": "application/json"},
            )
            if status != 200:
                raise TransportError(
                    f"_delete_by_query returned HTTP {status}: {text[:200]}"
                )
            deleted += int(json.loads(text).get("deleted", 0))
        return deleted

    def delete_from_dataframe(
        self,
        index: str,
        removed,
        *,
        batch_size: int = 1000,
        distributed: bool | None = None,
        distributed_threshold: int = 100_000,
    ) -> tuple[int, int]:
        """Delete every id in a one-column DataFrame.

        Small sets (≤ ``distributed_threshold``) stream through the
        driver via ``toLocalIterator`` — driver memory stays at one
        Spark partition (a full collect() of 10^8 ids would OOM the
        driver before the first wire batch left). Large sets dispatch
        to :func:`delete_from_dataframe_distributed`: at retired-
        subtree scale (10^8 removals) the driver loop is ~10^5
        SEQUENTIAL HTTP round-trips, while executors can ship their
        partitions concurrently. ``distributed=None`` decides by a
        count() of the removal set (one cheap aggregate — callers
        typically hold it cached from the diff that produced it).
        Returns (deleted, batches).
        """
        owned_cache = False
        if distributed is None:
            # The count() decides the path, then either path re-reads
            # `removed` — for an uncached diff that would execute the
            # caller's (possibly very expensive) upstream plan twice.
            # Materialize once unless the caller already cached it.
            # cache() (MEMORY_AND_DISK), NOT localCheckpoint: checkpoint
            # blocks are non-replicated and sever lineage, so losing one
            # executor (spot node, decommission) between the count and
            # the delete would fail the whole job; a cached plan just
            # recomputes the lost partitions.
            sl = removed.storageLevel
            if not (sl.useMemory or sl.useDisk):
                removed = removed.cache()
                owned_cache = True  # released below — a long-lived
                # driver runs one delete per cycle, and leaking one
                # cache entry per cycle is the same leak class
                # pipeline.release() exists to prevent (r6 advice).
            distributed = removed.count() > distributed_threshold
        try:
            if distributed:
                return delete_from_dataframe_distributed(
                    index,
                    removed,
                    self.base_url,
                    session=self.session,
                    batch_size=batch_size,
                    max_retries=self.max_retries,
                )
            col = removed.columns[0]
            deleted = batches = 0
            chunk: list[str] = []
            for row in removed.toLocalIterator():
                chunk.append(row[col])
                if len(chunk) >= batch_size:
                    deleted += self.delete_by_ids(
                        index, chunk, batch_size=batch_size
                    )
                    batches += 1
                    chunk = []
            if chunk:
                deleted += self.delete_by_ids(index, chunk, batch_size=batch_size)
                batches += 1
            return deleted, batches
        finally:
            if owned_cache:
                removed.unpersist()


def delete_from_dataframe_distributed(
    index: str,
    removed,
    base_url: str,
    *,
    session: Session | None = None,
    batch_size: int = 1000,
    max_retries: int = 3,
) -> tuple[int, int]:
    """Executor-side ES deletes: every partition opens its own client
    and ships its ids through ``_delete_by_query`` in wire-sized
    batches (elasticsearch_integration.py:526-551's batching,
    partition-parallel instead of driver-serial).

    Safe under Spark task retries: deletes are idempotent by id
    (``conflicts=proceed``) — a re-run partition re-deletes already-
    gone ids and ES reports 0 for them. ``session`` (or None for the
    stdlib default) is cloudpickled to the executors; a fresh client
    wraps it once per partition. Returns (deleted, http_requests)
    summed across partitions via one tiny aggregate — no id ever
    passes through the driver.
    """
    import pandas as pd

    col = removed.columns[0]

    def _ship(batches):
        client = EsClient(base_url, session, max_retries=max_retries)
        deleted = nreq = 0
        buf: list[str] = []

        def flush() -> None:
            nonlocal deleted, nreq, buf
            if buf:
                deleted += client.delete_by_ids(index, buf, batch_size=batch_size)
                nreq += 1
                buf = []

        for pdf in batches:
            for v in pdf[col]:
                buf.append(v)
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame({"deleted": [deleted], "requests": [nreq]})

    import pyspark.sql.functions as F

    row = (
        removed.select(col)
        .mapInPandas(_ship, "deleted long, requests long")
        .agg(F.sum("deleted"), F.sum("requests"))
        .first()
    )
    return int(row[0] or 0), int(row[1] or 0)


class KibanaClient(_RetryingClient):
    """Kibana saved-objects importer (kibana_data_views.py:245-313).

    Kibana's ``/api/saved_objects/_import`` requires multipart/form-data
    with the NDJSON as a ``file`` field (the reference passes
    ``files={'file': (...)}`` to requests); a raw application/ndjson
    body gets a 400/415. The multipart body is built by hand so the
    injectable session protocol stays single-shape (method, url,
    headers, bytes)."""

    def import_saved_objects(self, ndjson: str) -> bool:
        import hashlib

        # Content-derived boundary: deterministic, and a 32-hex-digit
        # md5 of the payload cannot collide with a line inside it.
        boundary = "----fsidx-" + hashlib.md5(ndjson.encode()).hexdigest()
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="export.ndjson"\r\n'
            "Content-Type: application/ndjson\r\n"
            "\r\n"
            f"{ndjson}\r\n"
            f"--{boundary}--\r\n"
        ).encode()
        status, text = self._request(
            "POST",
            "/api/saved_objects/_import?overwrite=true",
            body,
            {
                "Content-Type": f"multipart/form-data; boundary={boundary}",
                "kbn-xsrf": "true",
            },
        )
        if status != 200:
            return False
        try:
            return bool(json.loads(text).get("success", False))
        except ValueError:
            return False

    def create_data_views(self, index: str, time_field: str = "modified_time") -> bool:
        """Build + import the three saved objects (config, data view,
        default search) for an index."""
        from .kibana import data_view_objects, to_ndjson

        return self.import_saved_objects(to_ndjson(data_view_objects(index, time_field)))
