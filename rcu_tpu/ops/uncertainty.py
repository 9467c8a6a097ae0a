"""Uncertainty-vs-error decomposition and correction analysis, fused on device.

Semantics parity targets in the reference:
- confusion/uncertainty overlap: common/evalutation/numpyfunctions.py:86-107
- error dice/recall/precision 0/0->1 conventions: numpyfunctions.py:110-125
- correction analysis (benefit + corrected dice/accuracy):
  common/evalutation/eval.py:176-226

TPU-native design: one jitted pass computes the 8 overlap sums for *all*
thresholds at once (the threshold axis is vmapped, replacing the reference's
11 sequential python objects), and the "corrected" dice/accuracy values are
derived algebraically from the same 8 sums instead of materializing corrected
prediction volumes:

  correct-to-background: prediction := 0 where uncertain
     tp' = tp - tpu, fp' = fp - fpu, fn' = fn + tpu, tn' = tn + fpu
  correct-to-foreground: prediction := 1 where uncertain
     tp' = tp + fnu, fp' = fp + tnu, fn' = fn - fnu, tn' = tn - tnu
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rcu_tpu.ops.metrics import dice_from_counts


def uncertainty_counts(prediction, target, thresholded_uncertainty, mask=None):
    """(tp, tn, fp, fn, tpu, tnu, fpu, fnu) as float32 scalars.

    Reference numpyfunctions.py:86-107 (mask via weights, not fancy indexing).
    """
    p = prediction.astype(jnp.float32)
    t = target.astype(jnp.float32)
    u = thresholded_uncertainty.astype(jnp.float32)
    w = mask.astype(jnp.float32) if mask is not None else jnp.ones_like(p)

    tp_m = t * p * w
    fp_m = (1.0 - t) * p * w
    fn_m = t * (1.0 - p) * w
    tn_m = (1.0 - t) * (1.0 - p) * w

    tp = jnp.sum(tp_m)
    fp = jnp.sum(fp_m)
    fn = jnp.sum(fn_m)
    tn = jnp.sum(tn_m)
    tpu = jnp.sum(tp_m * u)
    fpu = jnp.sum(fp_m * u)
    fnu = jnp.sum(fn_m * u)
    tnu = jnp.sum(tn_m * u)
    return tp, tn, fp, fn, tpu, tnu, fpu, fnu


def error_dice(fp, fn, tpu, tnu, fpu, fnu):
    """2(fnu+fpu) / (fn+fp+fnu+fpu+tnu+tpu) with the reference's 0/0 -> 1."""
    num = jnp.asarray(fnu + fpu, jnp.float32)
    den = jnp.asarray(fn + fp + fnu + fpu + tnu + tpu, jnp.float32)
    return jnp.where((num == 0) & (den == 0), 1.0, (2.0 * num) / den)


def error_recall(fp, fn, fpu, fnu):
    num = jnp.asarray(fnu + fpu, jnp.float32)
    den = jnp.asarray(fn + fp, jnp.float32)
    return jnp.where((num == 0) & (den == 0), 1.0, num / den)


def error_precision(tpu, tnu, fpu, fnu):
    num = jnp.asarray(fnu + fpu, jnp.float32)
    den = jnp.asarray(fnu + fpu + tpu + tnu, jnp.float32)
    return jnp.where((num == 0) & (den == 0), 1.0, num / den)


def _correction_from_counts(counts):
    """All scalar outputs of UncertaintyAndCorrectionEvalNumpy from the 8 sums."""
    tp, tn, fp, fn, tpu, tnu, fpu, fnu = counts
    n = tp + tn + fp + fn

    tpu_fpu_ratio = tpu / fpu  # inf/nan semantics intentionally identical
    jaccard = tp / (tp + fp + fn)
    dice_benefit = tpu_fpu_ratio < jaccard
    accuracy_benefit = tpu_fpu_ratio < 1.0

    dice_val = dice_from_counts(tp, fp, fn)
    accuracy_val = (tp + tn) / n

    # correct-to-background
    corrected_dice = dice_from_counts(tp - tpu, fp - fpu, fn + tpu)
    corrected_accuracy = ((tp - tpu) + (tn + fpu)) / n
    # correct-to-foreground
    corrected_add_dice = dice_from_counts(tp + fnu, fp + tnu, fn - fnu)
    corrected_add_accuracy = ((tp + fnu) + (tn - tnu)) / n

    return {
        "tpu": tpu, "tnu": tnu, "fpu": fpu, "fnu": fnu,
        "tp": tp, "tn": tn, "fp": fp, "fn": fn,
        "dice_benefit": dice_benefit,
        "accuracy_benefit": accuracy_benefit,
        "dice": dice_val,
        "accuracy": accuracy_val,
        "corrected_dice": corrected_dice,
        "corrected_accuracy": corrected_accuracy,
        "dice_benefit_correct": (corrected_dice > dice_val) == dice_benefit,
        "accuracy_benefit_correct": (corrected_accuracy > accuracy_val) == accuracy_benefit,
        "corrected_add_dice": corrected_add_dice,
        "corrected_add_accuracy": corrected_add_accuracy,
    }


@jax.jit
def correction_eval(prediction, target, uncertainty, thresholds, weight=None):
    """Correction analysis for a whole vector of thresholds in one device pass.

    Returns a dict of arrays shaped (len(thresholds),) with exactly the result
    entries of reference eval.py:176-226 (uncertainty is compared with ``>``).
    ``weight`` marks which voxels exist (0 excludes, e.g. pad voxels added for
    even sharding across a device mesh); semantics are unchanged when None.
    """
    p = prediction.reshape(-1).astype(jnp.bool_)
    t = target.reshape(-1).astype(jnp.bool_)
    u = uncertainty.reshape(-1).astype(jnp.float32)
    w = weight.reshape(-1) if weight is not None else None

    def one(threshold):
        counts = uncertainty_counts(p, t, u > threshold, w)
        return _correction_from_counts(counts)

    return jax.vmap(one)(jnp.asarray(thresholds, jnp.float32))


@jax.jit
def uncertainty_error_metrics(prediction, target, uncertainty, thresholds, mask=None):
    """Error precision/recall/dice over a threshold vector (eval.py:145-173)."""
    p = prediction.reshape(-1).astype(jnp.bool_)
    t = target.reshape(-1).astype(jnp.bool_)
    u = uncertainty.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1) if mask is not None else None

    def one(threshold):
        tp, tn, fp, fn, tpu, tnu, fpu, fnu = uncertainty_counts(p, t, u > threshold, m)
        return {
            "precision": error_precision(tpu, tnu, fpu, fnu),
            "recall": error_recall(fp, fn, fpu, fnu),
            "dice": error_dice(fp, fn, tpu, tnu, fpu, fnu),
        }

    return jax.vmap(one)(jnp.asarray(thresholds, jnp.float32))
