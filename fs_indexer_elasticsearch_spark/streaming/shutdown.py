"""Graceful-shutdown coordination (SURVEY §2.10).

Reference parity: main.py:23-30 installs a SIGINT/SIGTERM handler
that flips a global ``shutdown_requested`` flag (which the rest of
the reference then never consults — the flag is vestigial). This
module implements the behavior the flag was FOR:

 - streaming queries registered with the coordinator are stopped
   (``query.stop()`` — Structured Streaming finishes the in-flight
   micro-batch, so a checkpointed foreachBatch sink commits or
   replays atomically; nothing is half-merged),
 - long-lived driver loops (the walker's frontier rounds, the API
   BFS) can poll ``requested`` between rounds,
 - the previous signal handlers are restored on ``uninstall()``.

Scale note: shutdown is a DRIVER concern — executors follow the
driver's job lifecycle, and SnapshotStore's atomic pointer swap
means a kill between versions can never publish a torn snapshot.
"""

from __future__ import annotations

import signal
import threading
from typing import Any


class ShutdownCoordinator:
    """Idempotent, thread-safe graceful-shutdown switch."""

    def __init__(self) -> None:
        self._event = threading.Event()
        self._queries: list[Any] = []
        self._previous: dict[int, Any] = {}
        self._lock = threading.Lock()

    # -- state --------------------------------------------------------------
    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def wait(self, timeout: float | None = None) -> bool:
        """Block until shutdown is requested (for supervisor threads)."""
        return self._event.wait(timeout)

    def register(self, query: Any) -> Any:
        """Track a StreamingQuery (anything with ``.stop()``) to be
        stopped on shutdown; returns it for chaining."""
        with self._lock:
            self._queries.append(query)
        return query

    # -- the handler --------------------------------------------------------
    def request_shutdown(self, signum: int | None = None, frame: Any = None) -> None:
        """Flip the flag and stop every registered query. Safe to call
        from a signal handler, any thread, or tests; repeat calls are
        no-ops for already-stopped queries."""
        self._event.set()
        with self._lock:
            queries = list(self._queries)
        for q in queries:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 - best-effort during teardown
                pass

    # -- signal plumbing ----------------------------------------------------
    def install(self, signals: tuple[int, ...] = (signal.SIGINT, signal.SIGTERM)) -> None:
        """Route the given signals to request_shutdown, remembering the
        handlers they replace (main-thread only, like signal itself).
        Idempotent: a second install() must NOT record our own handler
        as "previous" — uninstall() would then re-install
        request_shutdown instead of the original and Ctrl-C would be
        dead for the rest of the process."""
        for s in signals:
            prev = signal.signal(s, self.request_shutdown)
            self._previous.setdefault(s, prev)

    def uninstall(self) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()

    def __enter__(self) -> "ShutdownCoordinator":
        self.install()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.uninstall()
