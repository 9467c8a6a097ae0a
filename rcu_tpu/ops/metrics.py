"""Segmentation / classification metrics as pure, jittable JAX functions.

Functional parity targets (semantics, not code) in the reference:
- smooth dice / nll:      common/evalutation/torchfunctions.py:5-27
- dice / confusion / acc: common/evalutation/numpyfunctions.py:128-151 (pymia-backed)
- entropy:                common/evalutation/numpyfunctions.py:166-168
- log loss:               common/evalutation/numpyfunctions.py:154-163 (sklearn-backed)

All functions are shape-polymorphic under jit, run on the VPU, and accept an
optional boolean ``mask`` instead of boolean fancy-indexing (fancy indexing is
dynamic-shape and would break XLA; a weight-mask reduction is the TPU-native
formulation with identical results).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_counts(prediction: jnp.ndarray, target: jnp.ndarray, mask=None):
    """Binary confusion counts (tp, tn, fp, fn, n) as float32 scalars."""
    p = prediction.astype(jnp.bool_)
    t = target.astype(jnp.bool_)
    if mask is not None:
        w = mask.astype(jnp.float32)
    else:
        w = jnp.ones(p.shape, jnp.float32)
    pf = p.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    tp = jnp.sum(pf * tf * w)
    fp = jnp.sum(pf * (1.0 - tf) * w)
    fn = jnp.sum((1.0 - pf) * tf * w)
    n = jnp.sum(w)
    tn = n - tp - fp - fn
    return tp, tn, fp, fn, n


def dice_from_counts(tp, fp, fn):
    """Dice = 2tp / (2tp + fp + fn); 0/0 yields NaN exactly like a float div."""
    return (2.0 * tp) / (2.0 * tp + fp + fn)


def dice(prediction: jnp.ndarray, target: jnp.ndarray, mask=None):
    tp, tn, fp, fn, n = confusion_counts(prediction, target, mask)
    return dice_from_counts(tp, fp, fn)


def accuracy(prediction: jnp.ndarray, target: jnp.ndarray, mask=None):
    tp, tn, fp, fn, n = confusion_counts(prediction, target, mask)
    return (tp + tn) / n


def smooth_dice(prediction: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0):
    """Soft dice over flattened probabilities (training/eval score)."""
    iflat = prediction.astype(jnp.float32).reshape(-1)
    tflat = target.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(iflat * tflat)
    return (2.0 * intersection + smooth) / (jnp.sum(iflat) + jnp.sum(tflat) + smooth)


def nll(probabilities: jnp.ndarray, target: jnp.ndarray, do_log: bool = True):
    """Mean negative log-likelihood of the target class.

    ``probabilities`` has class dim last; ``target`` holds integer labels.
    With ``do_log`` the inputs are probabilities (log is applied), otherwise
    they are already log-probabilities.
    """
    probs = probabilities.astype(jnp.float32)
    if do_log:
        probs = jnp.log(probs)
    nb_classes = probs.shape[-1]
    flat = probs.reshape(-1, nb_classes)
    tflat = target.reshape(-1).astype(jnp.int32)
    picked = jnp.take_along_axis(flat, tflat[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def log_loss(probabilities: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-15):
    """Binary/multiclass cross-entropy with sklearn-style probability clipping.

    Matches ``sklearn.metrics.log_loss`` semantics used by the reference: probs
    are clipped to [eps, 1-eps] and renormalized across classes.
    """
    probs = probabilities.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    # dispatch on TOTAL element count, not on coincidental dim sizes: a
    # foreground map has exactly one probability per target element (any
    # shapes — callers flatten freely, e.g. (N, C) probs vs a (z, y, x)
    # target volume); anything larger carries a trailing class dim
    if probs.size == np.prod(target.shape):
        fg = probs.reshape(-1)
        flat = jnp.stack([1.0 - fg, fg], axis=-1)
    else:
        flat = probs.reshape(-1, probs.shape[-1])
        if flat.shape[0] != np.prod(target.shape):
            raise ValueError(
                f"log_loss shapes disagree: probabilities {probabilities.shape} "
                f"vs target {target.shape}")
    flat = jnp.clip(flat, eps, 1.0 - eps)
    flat = flat / jnp.sum(flat, axis=-1, keepdims=True)
    tflat = target.reshape(-1).astype(jnp.int32)
    picked = jnp.take_along_axis(flat, tflat[:, None], axis=-1)[:, 0]
    return -jnp.mean(jnp.log(picked))


def entropy(p: jnp.ndarray, axis: int = -1, keepdims: bool = False):
    """Shannon entropy with the 0*log(0)=0 convention (natural log)."""
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return -jnp.sum(plogp, axis=axis, keepdims=keepdims)
