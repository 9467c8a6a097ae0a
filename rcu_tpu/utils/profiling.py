"""Profiling support (SURVEY §5 tracing subsystem — the reference has only
wall-clock cadence logs; here: xprof-compatible device traces + the same
human-readable logs via ConsoleLogHook).
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfilerHook:
    """TrainLoop hook: traces steps [start, stop) of the first epoch."""

    def __init__(self, log_dir: str, start_step: int = 2, stop_step: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def __getattr__(self, name):
        if name.startswith("on_"):
            return lambda *a, **k: None
        raise AttributeError(name)

    def on_training_batch_end(self, loop, epoch, batch_index, nb_batches, metrics):
        if epoch != 0:
            return
        if batch_index + 1 == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logging.info("profiler trace started (%s)", self.log_dir)
        elif batch_index + 1 >= self.stop_step and self._active:
            self._stop()

    def on_training_end(self, loop, epoch, metrics_mean):
        # an epoch shorter than stop_step must still end the trace — a trace
        # left running profiles the whole run at sustained overhead
        if self._active:
            self._stop()

    def _stop(self):
        jax.profiler.stop_trace()
        self._active = False
        logging.info("profiler trace stopped")

    def on_termination(self, loop):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class Timer:
    """Cheap wall-clock section timer for host-side phases."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + \
                time.perf_counter() - t0

    def report(self) -> str:
        return " ".join(f"{k}={v:.3f}s" for k, v in sorted(self.sections.items()))
