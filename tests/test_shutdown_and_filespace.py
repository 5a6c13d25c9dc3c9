"""Graceful shutdown (§2.10, reference main.py:23-30) and filespace
selection (lucidlink/filespace_prompt.py:64-140)."""

from __future__ import annotations

import json
import os
import signal
import time

import pytest

from fs_indexer_elasticsearch_spark.sources.filespace import (
    FilespaceError,
    get_filespace_info,
)
from fs_indexer_elasticsearch_spark.streaming.shutdown import ShutdownCoordinator


class FakeQuery:
    def __init__(self):
        self.stopped = 0

    def stop(self):
        self.stopped += 1


def test_shutdown_flag_and_query_stop():
    co = ShutdownCoordinator()
    q1, q2 = FakeQuery(), FakeQuery()
    co.register(q1)
    co.register(q2)
    assert not co.requested
    co.request_shutdown()
    assert co.requested
    assert q1.stopped == 1 and q2.stopped == 1
    co.request_shutdown()  # idempotent — a second signal re-stops safely
    assert q1.stopped == 2


def test_signal_install_routes_and_restores():
    co = ShutdownCoordinator()
    q = co.register(FakeQuery())
    prev = signal.getsignal(signal.SIGTERM)
    with co:
        os.kill(os.getpid(), signal.SIGTERM)
        # Signal delivery is synchronous for the main thread on CPython,
        # but give the handler a beat to run anyway.
        for _ in range(50):
            if co.requested:
                break
            time.sleep(0.01)
        assert co.requested and q.stopped >= 1
    assert signal.getsignal(signal.SIGTERM) is prev


def test_streaming_query_stops_gracefully(spark, tmp_path):
    """A registered real StreamingQuery is stopped by the coordinator
    (§2.10 'graceful shutdown' with actual signal plumbing — the
    reference sets its flag but never stops anything)."""
    co = ShutdownCoordinator()
    stream = spark.readStream.format("rate").option("rowsPerSecond", "5").load()
    q = co.register(
        stream.writeStream.format("memory")
        .queryName("shutdown_smoke")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    assert q.isActive
    co.request_shutdown()
    q.awaitTermination(20)
    assert not q.isActive


def _runner_for(filespaces, mounts):
    def run(args):
        if args[1:] == ["list", "--json"]:
            return json.dumps(filespaces)
        if args[1] == "--instance" and args[3] == "status":
            return f"Some: x\nMount point: {mounts[int(args[2])]}\nUptime: 1d\n"
        raise AssertionError(f"unexpected command {args}")

    return run


def test_filespace_single_autoselects():
    run = _runner_for(
        [{"filespace": "prod.media", "port": 9778, "instanceId": 501}],
        {501: "/mnt/prod"},
    )
    raw, name, port, mount = get_filespace_info(version=3, runner=run)
    assert (raw, name, port, mount) == ("prod.media", "prod-media", 9778, "/mnt/prod")


def test_filespace_multi_uses_chooser_and_config_version():
    run = _runner_for(
        [
            {"filespace": "a.fs", "port": 1, "instanceId": 11},
            {"filespace": "b.fs", "port": 2, "instanceId": 22},
        ],
        {11: "/mnt/a", 22: "/mnt/b"},
    )
    seen = {}

    def chooser(names):
        seen["names"] = names
        return 1

    cfg = {"lucidlink_filespace": {"lucidlink_version": 2}}
    raw, name, port, mount = get_filespace_info(cfg, runner=run, chooser=chooser)
    assert (raw, name, port, mount) == ("b.fs", "b-fs", 2, "/mnt/b")
    assert seen["names"] == ["a.fs (port: 1)", "b.fs (port: 2)"]


def test_filespace_empty_raises():
    with pytest.raises(FilespaceError):
        get_filespace_info(version=2, runner=lambda args: "[]")


def test_filespace_explicit_version_survives_versionless_config():
    """A config dict WITHOUT lucidlink_version must not override an
    explicit version argument with the default (wrong CLI binary)."""
    from fs_indexer_elasticsearch_spark.sources.filespace import get_filespace_info

    calls = []

    def runner(argv):
        calls.append(argv[0])
        if argv[1] == "list":
            return '[{"filespace": "fs.one", "port": 7778, "instanceId": "i1"}]'
        return "Mount point: /mnt/fs\n"

    fs, name, port, mount = get_filespace_info(
        config={"unrelated": True}, version=2, runner=runner
    )
    assert calls and all(c == "lucid2" for c in calls)
    # And a config that DOES carry the version wins when no explicit
    # version is passed.
    calls.clear()
    get_filespace_info(
        config={"lucidlink_filespace": {"lucidlink_version": 3}}, runner=runner
    )
    assert calls and all(c == "lucid3" for c in calls)


def test_shutdown_install_idempotent():
    """A second install() must not record our own handler as the
    'previous' one — uninstall() would then leave request_shutdown
    installed forever and Ctrl-C would be dead post-teardown."""
    import signal

    from fs_indexer_elasticsearch_spark.streaming.shutdown import (
        ShutdownCoordinator,
    )

    orig_int = signal.getsignal(signal.SIGINT)
    orig_term = signal.getsignal(signal.SIGTERM)
    c = ShutdownCoordinator()
    try:
        c.install()
        c.install()  # defensive double-install (supervisor + context mgr)
        c.uninstall()
        assert signal.getsignal(signal.SIGINT) is orig_int
        assert signal.getsignal(signal.SIGTERM) is orig_term
    finally:
        signal.signal(signal.SIGINT, orig_int)
        signal.signal(signal.SIGTERM, orig_term)
