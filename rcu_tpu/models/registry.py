"""String -> model / optimizer registries (reference common/model/factory.py:8-22).

Models are flax Modules; optimizers are optax gradient transformations. The
yaml config node ``{type: {params}}`` maps 1:1 onto these entries, keeping the
reference's config surface (``model: {unet: {...}}``, ``optimizer: {adam: {lr}}``).
"""
from __future__ import annotations

import optax

from rcu_tpu.models.unet import PostNet, UNet


_DTYPES = {"float32": None, "bfloat16": "bfloat16", "float16": "float16"}


def get_model(model_type: str, params: dict):
    params = dict(params)
    # 'dtype' may arrive as a string from yaml configs ('bfloat16'/'float32')
    if isinstance(params.get("dtype"), str):
        name = params["dtype"]
        if name not in _DTYPES:
            raise ValueError(f'unknown model dtype "{name}" '
                             f"(expected one of {sorted(_DTYPES)})")
        import jax.numpy as jnp
        params["dtype"] = getattr(jnp, name) if _DTYPES[name] else None
    if model_type == "unet":
        return UNet(**params)
    if model_type == "postnet":
        return PostNet(**params)
    raise ValueError(f'unknown model type "{model_type}"')


def get_optimizer(optimizer_type: str, params: dict):
    params = dict(params)
    lr = params.pop("lr", None)
    if optimizer_type == "adam":
        return optax.adam(learning_rate=lr if lr is not None else 1e-3, **params)
    if optimizer_type == "sgd":
        return optax.sgd(learning_rate=lr if lr is not None else 1e-2, **params)
    raise ValueError(f'unknown optimizer type "{optimizer_type}"')
