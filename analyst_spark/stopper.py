"""Cooperative job cancellation — Stopper parity.

Reference: ``engine/stopper.go:5-32`` (an atomic, irreversible stop
flag every component polls) and ``engine/coordinator.go:277-413``
(context cancellation → ``c.Stop()`` → job-end ``txManager.Rollback``
→ ``ErrInterrupted``).

Spark mapping: executors don't poll a Python flag, so "stop" has two
halves here —

* the **flag** (this class), checked by the AQL executor between
  blocks and consulted at job end to pick rollback-vs-commit, and
* **job-group cancellation**: the executor tags every Spark action it
  launches with a per-job group id (``setJobGroup(...,
  interruptOnCancel=True)``) and registers a ``cancelJobGroup``
  callback on the stopper, so ``stop()`` also interrupts the Spark
  stages already in flight — the analog of the reference's components
  seeing ``Stopped()`` mid-stream and winding down.

``stop()`` is irreversible, and both methods are thread-safe (the
reference's atomic int32 semantics).
"""

from __future__ import annotations

import threading
from collections.abc import Callable


class JobInterrupted(RuntimeError):
    """Raised by the executor when a job ends because its stopper was
    stopped (the reference's ``ErrInterrupted``, engine/errors.go)."""


class Stopper:
    def __init__(self):
        self._stopped = threading.Event()
        self._lock = threading.Lock()
        self._on_stop: list[Callable[[], None]] = []

    def stopped(self) -> bool:
        return self._stopped.is_set()

    def stop(self) -> None:
        """Stop, irreversibly, and fire every registered cancel
        callback (each at most once; callback errors are swallowed —
        cancellation must never fail)."""
        with self._lock:
            if self._stopped.is_set():
                return
            self._stopped.set()
            callbacks, self._on_stop = self._on_stop, []
        for fn in callbacks:
            try:
                fn()
            except Exception:
                pass

    def on_stop(self, fn: Callable[[], None]) -> None:
        """Register a cancel callback; fires immediately if already
        stopped (a job started under a pre-stopped stopper must not
        launch work)."""
        with self._lock:
            if not self._stopped.is_set():
                self._on_stop.append(fn)
                return
        try:
            fn()
        except Exception:
            pass
