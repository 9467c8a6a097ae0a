"""Reliability binning / expected calibration error as fused on-device reductions.

Semantics parity target: common/evalutation/numpyfunctions.py:6-83 in the
reference. The reference digitizes foreground probabilities into
``linspace(0, 1 + 1e-8, n_bins + 1)`` edges, drops empty bins (returning
compressed arrays), and weights |confidence - accuracy| per bin.

TPU-native design differences (results identical):
- fixed-shape output: all ``n_bins`` bins are always returned together with a
  ``nonzero`` mask (XLA needs static shapes; the CSV layer re-expands anyway,
  reference rechun/eval/hook.py:75-93);
- binning is a branch-free ``floor(p * n_bins / (1+1e-8))`` plus one-pass
  masked segment reductions instead of digitize + bincount;
- the optional foreground mask is a weight array rather than fancy indexing.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_TOP = 1.0 + 1e-8  # top bin edge widening, reference numpyfunctions.py:53


def bin_ids(probabilities: jnp.ndarray, n_bins: int = 10):
    """Bin index per element; identical to ``np.digitize(p, linspace(0,1+1e-8,n+1)) - 1``.

    Bit-exact float64 digitize semantics in pure float32 (TPUs have no fast
    f64): each float64 edge is split into ``hi = f32(edge)`` and the statically
    known residual ``lo = edge - hi``. For a float32 probability ``p``,
    ``p >= edge`` in float64 is ``p > hi`` when ``lo > 0`` and ``p >= hi`` when
    ``lo <= 0`` — exact because one f32 ULP at ``hi`` always exceeds ``|lo|``.
    The 0-based bin id is then the number of edges[1:] that are <= p.
    """
    edges = np.linspace(0.0, _TOP, n_bins + 1)[1:]  # edge 0 is always passed
    p = probabilities.astype(jnp.float32)
    ids = jnp.zeros(p.shape, jnp.int32)
    for edge in edges:
        hi = np.float32(edge)
        lo = edge - float(hi)
        ge_edge = (p >= hi) if lo <= 0 else (p > hi)
        ids = ids + ge_edge.astype(jnp.int32)
    return jnp.clip(ids, 0, n_bins - 1)


def binary_calibration(probabilities: jnp.ndarray, target: jnp.ndarray,
                       n_bins: int = 10, mask=None):
    """Per-bin (positive fraction, mean confidence, count, nonzero) — fixed shape.

    ``probabilities`` is either the foreground probability map or a two-class
    probability array with class dim last (foreground column is used), matching
    reference numpyfunctions.py:26-37.
    """
    probs = probabilities
    if probs.ndim > target.ndim:
        if probs.shape[-1] > 2:
            raise ValueError("binary calibration needs binary probabilities")
        if probs.shape[-1] == 2:
            probs = probs[..., 1]
        else:
            probs = jnp.squeeze(probs, axis=-1)
    probs = probs.astype(jnp.float32).reshape(-1)
    tgt = target.astype(jnp.float32).reshape(-1)
    if mask is not None:
        w = mask.reshape(-1).astype(jnp.float32)
    else:
        w = jnp.ones_like(probs)

    ids = bin_ids(probs, n_bins)
    # One-hot (N, n_bins) contraction: XLA fuses the comparison+multiply+reduce
    # into a single pass over HBM; rides the VPU, no scatter.
    onehot = (ids[:, None] == jnp.arange(n_bins, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    wo = onehot * w[:, None]
    bin_total = jnp.sum(wo, axis=0)
    bin_sums = jnp.sum(wo * probs[:, None], axis=0)
    bin_true = jnp.sum(wo * tgt[:, None], axis=0)

    nonzero = bin_total > 0
    safe_total = jnp.where(nonzero, bin_total, 1.0)
    pos_frac = jnp.where(nonzero, bin_true / safe_total, 0.0)
    mean_confidence = jnp.where(nonzero, bin_sums / safe_total, 0.0)
    return pos_frac, mean_confidence, bin_total, nonzero


def _bin_proportions(bin_weighting: str, bin_count, nonzero, n_dim: int):
    """Bin weights over *nonzero* bins; zero bins get weight 0.

    Reference: numpyfunctions.py:72-83 (computed there on compressed arrays).
    """
    count = jnp.where(nonzero, bin_count, 0.0)
    if bin_weighting == "proportion":
        return count / jnp.sum(count)
    if bin_weighting == "log_proportion":
        logc = jnp.where(nonzero, jnp.log(jnp.where(nonzero, bin_count, 1.0)), 0.0)
        return logc / jnp.sum(logc)
    if bin_weighting == "power_proportion":
        powc = jnp.where(nonzero, jnp.where(nonzero, bin_count, 1.0) ** (1.0 / n_dim), 0.0)
        return powc / jnp.sum(powc)
    if bin_weighting == "mean_proportion":
        return jnp.where(nonzero, 1.0 / jnp.sum(nonzero.astype(jnp.float32)), 0.0)
    raise ValueError(f'unknown bin weighting "{bin_weighting}"')


@partial(jax.jit, static_argnames=("n_bins", "bin_weighting", "n_dim_override"))
def ece_binary_with_bins(probabilities, target, mask=None, n_bins: int = 10,
                         bin_weighting: str = "proportion", n_dim_override: int = None):
    """ECE plus the fixed-shape reliability bins (reference ece_binary with out_bins)."""
    n_dim = n_dim_override if n_dim_override is not None else target.ndim
    pos_frac, mean_conf, bin_count, nonzero = binary_calibration(
        probabilities, target, n_bins, mask)
    proportions = _bin_proportions(bin_weighting, bin_count, nonzero, n_dim)
    ece = jnp.sum(jnp.abs(mean_conf - pos_frac) * proportions)
    return ece, {
        "bins_count": bin_count,
        "bins_avg_confidence": mean_conf,
        "bins_positive_fraction": pos_frac,
        "bins_non_zero": nonzero,
    }


def threshold_range_mask(probabilities, target, threshold_range, mask=None):
    """Fold a ``(low, up)`` open-interval probability restriction into ``mask``.

    The reference restricts ECE to probabilities strictly inside the open
    interval by fancy indexing (numpyfunctions.py:42-47); here it is a mask so
    shapes stay static. Single source for :func:`ece_binary` and the
    strategy-protocol ``EceBinary`` — the interval/edge semantics must not
    drift between them.
    """
    probs = probabilities
    if probs.ndim > target.ndim:
        probs = probs[..., 1] if probs.shape[-1] == 2 else jnp.squeeze(probs, -1)
    low, up = threshold_range
    tr_mask = jnp.logical_and(probs < up, probs > low)
    return tr_mask if mask is None else jnp.logical_and(mask, tr_mask)


def ece_binary(probabilities, target, mask=None, n_bins: int = 10,
               bin_weighting: str = "proportion", threshold_range=None):
    """Expected calibration error (reference numpyfunctions.py:6-23).

    ``threshold_range=(low, up)`` restricts to probabilities strictly inside
    the open interval (reference numpyfunctions.py:42-47), expressed as a mask.
    """
    if threshold_range is not None:
        mask = threshold_range_mask(probabilities, target, threshold_range, mask)
    ece, _ = ece_binary_with_bins(probabilities, target, mask, n_bins, bin_weighting)
    return ece
