"""Fused ensemble training: all K members as ONE pjit program on a 2-D mesh.

The reference trains its 10-member ensemble as 10 separate sequential jobs
(config/train_ensemble/, SURVEY §2.7 P2). TPU-native mapping: stack member
params on a leading axis, vmap the train step over it, and lay the member axis
over the mesh's 'model' axis and the batch axis over 'data' — K members × B
batch train simultaneously, gradients all-reduced only within each member's
data shards. This is EP-style parallelism for the ensemble axis.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


def make_ensemble_mesh(n_model: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by {n_model} members")
    arr = np.asarray(devices).reshape(n_model, n // n_model)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def stack_states(states):
    """Stack per-member TrainStates on a leading member axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *states)


def make_vmapped_ensemble_train_step(train_step_fn):
    """vmap a (state, batch, rng) -> (state, metrics) step over the member axis.

    ``batch`` gains a leading member axis too (each member sees its own data —
    the jackknife splits of the reference's k10 ensembles)."""
    return jax.vmap(train_step_fn)


def shard_ensemble_train_step(vmapped_step, mesh: Mesh, donate: bool = True):
    """jit the vmapped step over the 2-D mesh: member axis on 'model', batch
    axis on 'data', per-member state sharded over 'model' only."""
    state_sh = NamedSharding(mesh, P(MODEL_AXIS))
    batch_sh = NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS))
    rng_sh = NamedSharding(mesh, P(MODEL_AXIS))
    return jax.jit(
        vmapped_step,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate else (),
    )
