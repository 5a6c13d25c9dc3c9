"""HTTP transport clients (ES bulk / delete_by_query / Kibana import)
over injectable fake sessions — the reference's mode-matrix mock seam
(tests/test_configuration_modes.py:188-351) re-expressed: instead of
patching module attributes, the session protocol is injected."""

from __future__ import annotations

import json
import os

import pytest

from fs_indexer_elasticsearch_spark.pipeline import run_pipeline
from fs_indexer_elasticsearch_spark.sinks.http_transport import (
    EsClient,
    KibanaClient,
    TransportError,
)
from fs_indexer_elasticsearch_spark.sources.config import PipelineConfig


class RecordingSession:
    """Scripted session: records every request, plays back responses."""

    def __init__(self, responses=None):
        self.calls: list[tuple[str, str, dict, bytes]] = []
        self.responses = list(responses or [])

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url, dict(headers), body))
        if self.responses:
            r = self.responses.pop(0)
            if isinstance(r, Exception):
                raise r
            return r
        # Default: succeed, acking every bulk action in the body.
        if "_bulk" in url:
            n = sum(
                1
                for ln in body.decode().splitlines()
                if ln and ("\"index\"" in ln or "\"delete\"" in ln) and "\"_id\"" in ln
            )
            items = [{"index": {"status": 201}} for _ in range(n)]
            return 200, json.dumps({"items": items})
        if "_delete_by_query" in url:
            n = len(json.loads(body)["query"]["terms"]["id"])
            return 200, json.dumps({"deleted": n})
        return 200, json.dumps({"success": True})


def test_bulk_counts_successes_and_failures():
    resp = {"items": [{"index": {"status": 201}}, {"index": {"status": 400, "error": "boom"}}]}
    s = RecordingSession([(200, json.dumps(resp))])
    es = EsClient("http://es:9200", s)
    ok, failed = es.bulk_lines(['{"index":{"_id":"a"}}', "{}", '{"index":{"_id":"b"}}', "{}"])
    assert (ok, failed) == (1, 1)
    method, url, headers, body = s.calls[0]
    assert method == "POST" and url.endswith("/_bulk?refresh=true")
    assert headers["Content-Type"] == "application/x-ndjson"
    assert body.endswith(b"\n")


def test_retry_backoff_then_success():
    good = (200, json.dumps({"items": [{"index": {"status": 200}}]}))
    s = RecordingSession([(503, "unavailable"), ConnectionError("reset"), good])
    sleeps = []
    es = EsClient(
        "http://es:9200", s, max_retries=3, backoff_base=0.1, sleep=sleeps.append
    )
    ok, failed = es.bulk_lines(['{"index":{"_id":"a"}}', "{}"])
    assert (ok, failed) == (1, 0)
    assert len(s.calls) == 3
    assert sleeps == [0.1, 0.2]  # exponential backoff


def test_retries_exhausted_raises():
    s = RecordingSession([(503, "no"), (503, "no"), (429, "slow"), (503, "no")])
    es = EsClient("http://es:9200", s, max_retries=3, sleep=lambda _: None)
    with pytest.raises(TransportError):
        es.bulk_lines(['{"index":{"_id":"a"}}', "{}"])
    assert len(s.calls) == 4  # 1 try + 3 retries


def test_non_retryable_http_error_fails_fast():
    s = RecordingSession([(400, "bad request")])
    es = EsClient("http://es:9200", s, sleep=lambda _: None)
    with pytest.raises(TransportError):
        es.bulk_lines(['{"index":{"_id":"a"}}', "{}"])
    assert len(s.calls) == 1  # 4xx (except 429) never retries


def test_delete_by_ids_batches_of_1000():
    s = RecordingSession()
    es = EsClient("http://es:9200", s)
    deleted = es.delete_by_ids("fs-entries", [f"id{i}" for i in range(2500)])
    assert deleted == 2500
    assert len(s.calls) == 3
    sizes = [len(json.loads(b)["query"]["terms"]["id"]) for _, _, _, b in s.calls]
    assert sizes == [1000, 1000, 500]
    assert all(
        u.endswith("/fs-entries/_delete_by_query?conflicts=proceed&refresh=true")
        for _, u, _, _ in s.calls
    )


def test_kibana_import_is_multipart_file_field():
    """The _import endpoint requires multipart/form-data with a 'file'
    field (reference kibana_data_views.py:245-313 via requests
    files=...); assert boundary wiring, field name, and that the file
    part carries the exact NDJSON."""
    s = RecordingSession([(200, json.dumps({"success": True, "successCount": 3}))])
    kb = KibanaClient("http://kibana:5601", s)
    assert kb.create_data_views("fs-entries") is True
    method, url, headers, body = s.calls[0]
    assert url.endswith("/api/saved_objects/_import?overwrite=true")
    assert headers["kbn-xsrf"] == "true"
    ctype = headers["Content-Type"]
    assert ctype.startswith("multipart/form-data; boundary=")
    boundary = ctype.split("boundary=", 1)[1]
    text = body.decode()
    assert text.startswith(f"--{boundary}\r\n")
    assert text.endswith(f"--{boundary}--\r\n")
    head, payload = text.split("\r\n\r\n", 1)
    assert 'name="file"' in head and 'filename="export.ndjson"' in head
    assert "Content-Type: application/ndjson" in head
    ndjson = payload.rsplit(f"\r\n--{boundary}--", 1)[0]
    types = [json.loads(ln)["type"] for ln in ndjson.strip().split("\n")]
    assert types == ["config", "index-pattern", "search"]


def test_delete_from_dataframe_streams_batches(spark):
    """Deletes driven from a DataFrame must reach the wire in 1000-id
    bodies WITHOUT a driver-side collect of the full id set."""
    s = RecordingSession()
    es = EsClient("http://es:9200", s)
    removed = spark.range(2500).selectExpr("concat('id', id) as id")
    deleted, batches = es.delete_from_dataframe("fs-entries", removed)
    assert (deleted, batches) == (2500, 3)
    sizes = [len(json.loads(b)["query"]["terms"]["id"]) for _, _, _, b in s.calls]
    assert sorted(sizes, reverse=True) == [1000, 1000, 500]
    ids = [i for _, _, _, b in s.calls for i in json.loads(b)["query"]["terms"]["id"]]
    assert sorted(ids) == sorted(f"id{i}" for i in range(2500))


def test_delete_from_dataframe_distributed_partition_path(spark):
    """The executor-side delete path must ship every id in ≤1000-id
    _delete_by_query bodies from within the partitions (no driver
    iteration), and report (deleted, requests) totals through the
    aggregate. The fake session rides to executors via cloudpickle."""
    from fs_indexer_elasticsearch_spark.sinks.http_transport import (
        delete_from_dataframe_distributed,
    )

    # Closure fake (not a test-module class): cloudpickle ships it by
    # value — executors cannot import the test module.
    def fake_session(method, url, headers, body):
        import json as _json

        assert "_delete_by_query" in url
        ids = _json.loads(body)["query"]["terms"]["id"]
        assert len(ids) <= 1000  # wire batches stay ≤ batch_size
        return 200, _json.dumps({"deleted": len(ids)})

    removed = spark.range(2500).selectExpr("concat('id', id) as id").repartition(1)
    deleted, requests = delete_from_dataframe_distributed(
        "fs-entries", removed, "http://es:9200", session=fake_session
    )
    # One partition of 2500 ids → exactly ceil(2500/1000) = 3 requests.
    assert (deleted, requests) == (2500, 3)

    # Multi-partition: totals still exact; each partition batches
    # independently so the request count is ceil per partition.
    removed4 = spark.range(2500).selectExpr("concat('id', id) as id").repartition(4)
    deleted4, requests4 = delete_from_dataframe_distributed(
        "fs-entries", removed4, "http://es:9200", session=fake_session
    )
    assert deleted4 == 2500
    assert 3 <= requests4 <= 4

    # Empty removal set: no requests, no error.
    empty = spark.range(0).selectExpr("concat('id', id) as id")
    assert delete_from_dataframe_distributed(
        "fs-entries", empty, "http://es:9200", session=fake_session
    ) == (0, 0)


def test_delete_from_dataframe_auto_dispatch(spark):
    """EsClient.delete_from_dataframe switches to the distributed path
    when the removal set exceeds the threshold (driver loop stays the
    small-N default)."""
    driver_calls = []

    def fake_session(method, url, headers, body):
        import json as _json

        driver_calls.append(url)  # mutates only the DRIVER copy
        ids = _json.loads(body)["query"]["terms"]["id"]
        return 200, _json.dumps({"deleted": len(ids)})

    es = EsClient("http://es:9200", fake_session)
    removed = spark.range(2500).selectExpr("concat('id', id) as id")
    deleted, _ = es.delete_from_dataframe(
        "fs-entries", removed, distributed_threshold=100
    )
    assert deleted == 2500
    # Distributed: requests fire inside executor processes, so the
    # driver copy of the closure's list must have recorded nothing.
    assert driver_calls == []


def _write(path, content=b"x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(content)


def test_pipeline_ships_live_when_clients_injected(spark, tmp_path):
    """elasticsearch mode + injected clients: every doc is bulk-POSTed
    (one request per partition file), removals go through
    delete_by_query, Kibana objects are imported; index-only mode
    never touches the wire — the reference's
    bulk_index.assert_called_once / assert_not_called matrix."""
    import time

    root = str(tmp_path / "fsroot")
    for i in range(4):
        _write(f"{root}/d/f{i}.txt", b"x" * (i + 1))
    cfg = PipelineConfig(
        root_path=root,
        skip_patterns=[],
        snapshot_path=str(tmp_path / "snap"),
        direct_links_enabled=False,
        num_buckets=2,
        es_index="fs-entries",
    )
    es_s, kb_s = RecordingSession(), RecordingSession()
    es = EsClient("http://es:9200", es_s)
    kb = KibanaClient("http://kibana:5601", kb_s)

    r1 = run_pipeline(
        spark, cfg, out_dir=str(tmp_path / "o1"), es_client=es, kibana_client=kb
    )
    # 4 files + 1 dir indexed; kibana import fired once.
    assert r1.stats["es_indexed"] == 5 and r1.stats["es_failed"] == 0
    assert r1.stats["kibana_ok"] is True
    assert all("_bulk" in u for _, u, _, _ in es_s.calls)
    assert len(kb_s.calls) == 1

    # Gen 2: one removal → a delete_by_query with exactly that id.
    time.sleep(1.1)
    os.remove(f"{root}/d/f0.txt")
    removed_id = next(
        r.id for r in r1.entries.collect() if r.relative_path == "/d/f0.txt"
    )
    es_s.calls.clear()
    r2 = run_pipeline(
        spark, cfg, out_dir=str(tmp_path / "o2"), es_client=es, kibana_client=kb
    )
    assert r2.stats["es_deleted"] == 1
    dbq = [c for c in es_s.calls if "_delete_by_query" in c[1]]
    assert len(dbq) == 1
    assert json.loads(dbq[0][3])["query"]["terms"]["id"] == [removed_id]

    # index-only: the wire stays silent.
    es_s.calls.clear()
    kb_s.calls.clear()
    cfg_idx = PipelineConfig(
        root_path=root,
        skip_patterns=[],
        snapshot_path=str(tmp_path / "snap_idx"),
        mode="index-only",
        direct_links_enabled=False,
        num_buckets=2,
    )
    r3 = run_pipeline(
        spark, cfg_idx, out_dir=str(tmp_path / "o3"), es_client=es, kibana_client=kb
    )
    assert r3.snapshot_version == 1  # snapshot still maintained
    assert es_s.calls == [] and kb_s.calls == []
    assert "es_indexed" not in r3.stats and "kibana_ok" not in r3.stats


def test_ship_bulk_dir_chunks_requests_at_action_boundaries(tmp_path):
    """A part file bigger than the batch/byte budget must split into
    multiple _bulk requests, and index action+source pairs must never
    straddle a request (an orphaned trailing action line is a malformed
    body ES rejects). Reference parity: bulk_size batching
    (elasticsearch_integration.py, config bulk_size=100k)."""
    part = tmp_path / "part-00000"
    lines = []
    for i in range(7):  # 7 index docs = 14 lines
        lines.append('{"index":{"_index":"x","_id":"%d"}}' % i)
        lines.append('{"f":%d}' % i)
    for i in range(3):  # 3 single-line deletes
        lines.append('{"delete":{"_index":"x","_id":"d%d"}}' % i)
    part.write_text("\n".join(lines) + "\n")

    ses = RecordingSession()
    es = EsClient("http://es:9200", ses)
    ok, failed = es.ship_bulk_dir(str(tmp_path), batch_docs=4)
    assert failed == 0 and ok == 10
    # ceil(10 docs / 4) = 3 requests.
    bulk_calls = [c for c in ses.calls if "_bulk" in c[1]]
    assert len(bulk_calls) == 3
    for _, _, _, body in bulk_calls:
        sent = [ln for ln in body.decode().splitlines() if ln]
        # No request body ends with an orphaned paired-action line.
        assert not sent[-1].startswith(('{"index":', '{"create":', '{"update":'))
    # Byte cap alone also splits: 10 docs, tiny doc budget.
    ses2 = RecordingSession()
    es2 = EsClient("http://es:9200", ses2)
    ok2, _ = es2.ship_bulk_dir(str(tmp_path), batch_docs=1000, max_bytes=120)
    assert ok2 == 10
    assert len([c for c in ses2.calls if "_bulk" in c[1]]) > 1
