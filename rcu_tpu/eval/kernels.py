"""Fused per-subject evaluation kernels — the on-device replacement of the
reference's numpy metric pass (bin-eval/eval_uncertainty.py:67-74 over
common/evalutation). One jitted program per action computes everything the
CSV row needs from a single device visit of the subject volume.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rcu_tpu.ops import calibration as cal_ops
from rcu_tpu.ops import metrics as metrics_ops
from rcu_tpu.ops.uncertainty import correction_eval  # noqa: F401 (re-export)


def _combine_mask(mask, weight):
    """ECE fg-mask AND existence weight; either may be None."""
    if mask is None:
        return weight
    if weight is None:
        return mask
    return jnp.logical_and(mask.astype(jnp.bool_), weight.astype(jnp.bool_))


@partial(jax.jit, static_argnames=("n_bins",))
def ece_dice_confusion(probabilities, target, prediction, mask=None,
                       n_bins: int = 10, weight=None):
    """EceAction fusion: masked ECE + unmasked dice + unmasked confusion
    (reference eval_uncertainty.py:141-173 — only the ECE sees the fg mask).

    ``weight`` marks existing voxels (0 = padding added for even sharding over
    a device mesh) and applies to every reduction; None leaves semantics as-is.
    """
    ece, _ = cal_ops.ece_binary_with_bins(probabilities, target,
                                          _combine_mask(mask, weight), n_bins)
    tp, tn, fp, fn, n = metrics_ops.confusion_counts(prediction, target, weight)
    dice = metrics_ops.dice_from_counts(tp, fp, fn)
    return {"ece": ece, "dice": dice, "tp": tp, "tn": tn, "fp": fp, "fn": fn,
            "n": n}


@partial(jax.jit, static_argnames=("n_bins",))
def calibration_bins(probabilities, target, prediction, mask=None,
                     n_bins: int = 10, weight=None):
    """EceCalibrationAction fusion: masked ECE + the 4x10 reliability-bin
    outputs + unmasked dice (reference eval_uncertainty.py:112-138)."""
    ece, bins = cal_ops.ece_binary_with_bins(probabilities, target,
                                             _combine_mask(mask, weight), n_bins)
    tp, tn, fp, fn, n = metrics_ops.confusion_counts(prediction, target, weight)
    dice = metrics_ops.dice_from_counts(tp, fp, fn)
    return {"ece": ece, "dice": dice, **bins}


@jax.jit
def min_max(x):
    return {"min": jnp.min(x), "max": jnp.max(x)}
