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


def measure_practical_hbm(n_elems: int = 128 * 1024 * 1024, steps: int = 600,
                          rounds: int = 3) -> float:
    """Measured PRACTICAL HBM bandwidth (bytes/s) of the default device.

    A ``lax.scan`` of an elementwise multiply-add over a large f32 buffer:
    each step must read and write the whole carry from/to HBM (XLA cannot
    fuse across While iterations), so achieved bytes/s =
    ``2 * buffer_bytes * steps / time``. This is the HBM analog of the
    practical-MXU-peak matmul in ``scripts/bf16_gap_analysis.py --peak`` —
    a roofline percentage against the NOMINAL figure (819 GB/s on v5e)
    cannot distinguish "at the roof" from "30% headroom".

    The multiply-add (not a plain copy) keeps XLA from eliding the chain;
    the scan keeps the whole measurement ONE dispatch so the remote-tunnel
    round trip does not contaminate it (CLAUDE.md: a dispatch needs ~1 s of
    device work — the default 600 steps move ~640 GB, ~0.8 s even at the
    nominal 819 GB/s; steps=10 read back a tunnel-RTT number, ~205 GB/s)."""
    import jax.numpy as jnp

    x = jnp.full((n_elems,), 1.0, jnp.float32)

    @jax.jit
    def stream(x0):
        def step(y, _):
            return y * jnp.float32(1.0000001) + jnp.float32(1e-7), None
        y, _ = jax.lax.scan(step, x0, None, length=steps)
        return y

    float(stream(x)[0])  # compile + warm (value fetch = remote sync)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(stream(x)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return 2.0 * float(x.size) * 4 * steps / best


def measure_practical_ici(mesh=None, axis_name: str = None,
                          n_elems: int = 16 * 1024 * 1024, steps: int = 800,
                          rounds: int = 3) -> float:
    """Measured PRACTICAL per-link ICI bandwidth (bytes/s, one direction).

    The third practical roof next to :func:`measure_practical_hbm` and the
    practical-MXU matmul (``scripts/bf16_gap_analysis.py --peak``): sharding
    plans for multi-chip runs need the *achieved* interconnect rate, not the
    spec sheet's. A ``lax.scan`` ring-``ppermute`` of each device's local
    f32 shard along ``axis_name``: every step, every device sends its whole
    shard one hop and receives one, so per-link one-direction bytes/s =
    ``shard_bytes * steps / time`` (a tiny multiply keeps the chain live).
    One dispatch per round; the defaults move ``64 MB x 800 steps`` ~= 51 GB
    per link — >1 s of device work even at a v5e link's ~45 GB/s, so a
    remote-tunnel RTT cannot dominate (CLAUDE.md rule; the HBM measurer
    sizes itself the same way).

    Only meaningful on real multi-chip hardware (on the virtual CPU mesh it
    measures host memcpy); ``tests/test_parallel.py`` pins the mechanics.
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if mesh is None:
        mesh = Mesh(jax.devices(), ("data",))
    axis_name = axis_name or mesh.axis_names[-1]
    n = mesh.shape[axis_name]
    if n < 2:
        raise ValueError(f"mesh axis {axis_name!r} has {n} device(s); "
                         "a ring needs >= 2")
    perm = [(i, (i + 1) % n) for i in range(n)]
    spec = PartitionSpec(axis_name)

    def ring(y):
        def step(z, _):
            z = jax.lax.ppermute(z, axis_name, perm)
            return z * jnp.float32(1.0000001), None
        y, _ = jax.lax.scan(step, y, None, length=steps)
        return y

    fn = jax.jit(shard_map(ring, mesh=mesh, in_specs=spec, out_specs=spec))
    # fill directly into the sharded layout: materializing the full buffer
    # on one device first would need n x shard_bytes there (OOM at large n)
    # and fails outright on a multi-host mesh
    x = jax.jit(lambda: jnp.full((n * n_elems,), 1.0, jnp.float32),
                out_shardings=NamedSharding(mesh, spec))()
    float(fn(x)[0])  # compile + warm (value fetch = remote sync)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(fn(x)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return float(n_elems) * 4 * steps / best


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
