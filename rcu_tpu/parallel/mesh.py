"""Device mesh + sharding helpers — the framework's distribution module.

The reference's only device parallelism is single-host ``nn.DataParallel``
(common/trainloop/context.py:223-233). The TPU-native equivalent (SURVEY §2.7
P1/P5) is a 1-D data mesh over ICI: batches are sharded on their leading axis,
parameters/optimizer state are replicated, and XLA inserts the gradient
all-reduce automatically when the jitted train step consumes sharded batches
with replicated-out params. BatchNorm statistics become *globally* synced
(an upgrade over DataParallel's per-replica BN — documented deviation).

Usage::

    mesh = make_mesh()                       # all local devices, axis 'data'
    sharding = batch_sharding(mesh)          # leading-axis sharded
    step = shard_train_step(step, mesh)      # jit with shardings
    for batch in prefetch(it, sharding=sharding): ...
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: str = None, num_processes: int = None,
                           process_id: int = None):
    """Multi-host bring-up (jax.distributed). On a multi-host pod slice call
    this once per process before building the mesh — with no args the TPU
    coordinator/num_processes auto-detection applies; jax.devices() then spans
    all hosts and the same NamedSharding code paths ride ICI across them.
    Single-host setups (this image) simply do not call it."""
    kwargs = {k: v for k, v in dict(coordinator_address=coordinator_address,
                                    num_processes=num_processes,
                                    process_id=process_id).items()
              if v is not None}
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None, n_devices: int = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # silently truncating would run "-devices 8" on one chip while
            # the user believes they're sharding over eight
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} {devices[0].platform} device(s) are "
                "available (for CPU-mesh testing set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "RCU_PLATFORM=cpu)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch dicts (rank-polymorphic: jax broadcasts
    the spec's first axis; scalars/1-D 'valid' arrays shard on axis 0 too)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded over the data axis."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def shard_train_step(train_step_fn, mesh: Mesh, donate: bool = True):
    """jit a (state, batch, rng) -> (state, metrics) step over the mesh:
    state replicated, batch data-sharded. XLA emits psum over ICI for grads."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step_fn,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def pad_batch_size_to_mesh(batch_size: int, mesh: Mesh) -> int:
    """Round ``batch_size`` up to the mesh's DATA-axis extent — batches shard
    with ``P('data', ...)``-style specs, so only that axis must divide them.
    Padding to the total device count would inflate small batches by the
    model-axis factor on a 2-D ensemble mesh for nothing."""
    n = dict(mesh.shape).get(DATA_AXIS, mesh.devices.size)
    return -(-batch_size // n) * n
