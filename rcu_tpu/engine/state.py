"""Train state pytree + constructors (replaces the torch context's mutable
model/optimizer state, reference common/trainloop/context.py:165-233)."""
from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    params: typing.Any
    batch_stats: typing.Any
    opt_state: typing.Any
    epoch: jnp.ndarray        # int32 scalar
    best_score: jnp.ndarray   # float32 scalar; -inf when unset


def init_variables(model, input_shape, rng=None) -> tuple:
    """(params, batch_stats) template, initialized on the host CPU backend
    and shipped to the default device.

    On this image's remote (axon) TPU backend a model-init compile costs
    60-100s of tunnel time; initializing on CPU and shipping the pytree takes
    ~1s and is numerically identical. Inference paths that only need a
    checkpoint-restore template use this directly (no optimizer state)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    init = lambda: model.init(  # noqa: E731
        {"params": rng}, jnp.zeros(input_shape, jnp.float32), train=False)
    if cpu is not None:
        with jax.default_device(cpu):
            variables = jax.jit(init)()
    else:
        variables = init()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    default = jax.local_devices()[0]  # local: multi-host safe
    if cpu is not None and default != cpu:
        params = jax.device_put(params, default)
        batch_stats = jax.device_put(batch_stats, default)
    return params, batch_stats


def create_train_state(model, optimizer, input_shape, rng=None) -> TrainState:
    """Full training state: :func:`init_variables` + fresh optimizer state."""
    params, batch_stats = init_variables(model, input_shape, rng)
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state,
                      epoch=jnp.asarray(0, jnp.int32),
                      best_score=jnp.asarray(-jnp.inf, jnp.float32))
