"""Pure preparation transforms for the offline uncertainty evaluation.

Semantics parity targets: rechun/eval/helper.py:7-28 and
rechun/eval/analysis.py:151-215 in the reference. All are pure jittable
functions over whole subject volumes; the eval engine composes them on device.
"""
from __future__ import annotations

import jax.numpy as jnp


def rescale_linear(x: jnp.ndarray, min_, max_, epsilon: float = 1e-5):
    """Min/max rescale into [eps, 1-eps] (reference helper.py:19-22)."""
    rescaled = (x - min_) / (max_ - min_)
    return rescaled * (1.0 - 2.0 * epsilon) + epsilon


def rescale_subject_min_max(x: jnp.ndarray, epsilon: float = 1e-5):
    """Per-subject min/max rescale (reference analysis.py:168-177)."""
    return rescale_linear(x, jnp.min(x), jnp.max(x), epsilon)


def uncertainty_to_foreground_probabilities(uncertainty: jnp.ndarray, prediction: jnp.ndarray):
    """Fold a [0,1] uncertainty map into a foreground probability map.

    u/2 on predicted-background voxels, 1 - u/2 on predicted-foreground voxels
    (reference helper.py:7-16).
    """
    half = uncertainty * 0.5
    return jnp.where(prediction == 1, 1.0 - half, half)


def add_background_probability(probability: jnp.ndarray):
    """Stack [1-p, p] on a new trailing class axis (reference helper.py:25-28)."""
    return jnp.stack([1.0 - probability, probability], axis=-1)


def fold_sigma_host(sigma, prediction, sigma_min, sigma_max,
                    epsilon: float = 1e-5):
    """Numpy twin of ``rescale_linear`` + ``uncertainty_to_foreground_
    probabilities`` for host-side paths (serving's unscored-with-bounds
    confidence fold) — one home for the protocol's epsilon and fold formula
    so the host and device paths cannot drift."""
    import numpy as np
    sigma = np.asarray(sigma, np.float32)
    rescaled = (sigma - np.float32(sigma_min)) \
        / (np.float32(sigma_max) - np.float32(sigma_min))
    rescaled = rescaled * np.float32(1.0 - 2.0 * epsilon) + np.float32(epsilon)
    return np.where(np.asarray(prediction) == 1,
                    1.0 - rescaled * 0.5, rescaled * 0.5).astype(np.float32)


def check_min_max(arr, min_=0.0, max_=1.0, only_warn: bool = False):
    """Host-side range check with warn/raise modes (reference helper.py:31-47)."""
    import warnings

    import numpy as np
    arr = np.asarray(arr)
    arr_max, arr_min = float(arr.max()), float(arr.min())
    for bad, msg in ((arr_max > max_, f'Found value larger than {max_}: "{arr_max}"'),
                     (arr_min < min_, f'Found value smaller than {min_}: "{arr_min}"')):
        if bad:
            if only_warn:
                warnings.warn(msg)
            else:
                raise ValueError(msg)


def normalized_entropy(probabilities: jnp.ndarray, nb_classes: int = 2):
    """Entropy of a class-last probability array, normalized to [0,1] by log(C).

    Reference analysis.py:188-205 (ToEntropy).
    """
    if probabilities.shape[-1] != nb_classes:
        raise ValueError(
            f"last dimension of probability array ({probabilities.shape}) must "
            f"be equal to nb_classes ({nb_classes})")
    p = probabilities
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return -jnp.sum(plogp, axis=-1) / jnp.log(float(nb_classes))
