"""Background artifact writer pool with explicit flush.

Replaces the reference's fire-and-forget writer threads
(common/utils/threadhelper.py:6-18) — a known-fragile pattern the SURVEY calls
out (BraTS test hook never joins). This pool is a bounded ThreadPoolExecutor
whose ``flush()`` is called deterministically at loop end; exceptions surface
there instead of dying silently.
"""
from __future__ import annotations

import concurrent.futures
import threading


class WriterPool:
    def __init__(self, max_workers: int = 4):
        self._executor = concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)
        self._futures = []
        self._lock = threading.Lock()

    def submit(self, fn, *args, **kwargs):
        fut = self._executor.submit(fn, *args, **kwargs)
        with self._lock:
            self._futures.append(fut)
        return fut

    def flush(self):
        """Wait for ALL pending writes to finish, then re-raise the first
        failure. Waiting first (not raising mid-loop) matters: an early
        failure must not abandon still-running writes untracked — the
        caller would tear down while threads are mutating the run dir and
        later failures would never surface."""
        with self._lock:
            futures, self._futures = self._futures, []
        if not futures:
            return
        concurrent.futures.wait(futures)
        for fut in futures:
            fut.result()

    def shutdown(self):
        try:
            self.flush()
        finally:
            self._executor.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
