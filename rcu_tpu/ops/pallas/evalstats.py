"""Pallas TPU kernel: the ENTIRE per-subject uncertainty evaluation in one
HBM pass.

The lax implementation (rcu_tpu/eval/kernels.py) reads the subject volume
several times: once for the reliability-bin one-hot contraction, once for the
confusion counts, and once per correction threshold (11 vmapped passes over
the uncertainty map). This kernel streams the five input planes
(fg-probability, target, prediction, uncertainty, weight) through VMEM exactly
once and accumulates every statistic the eval CSVs need:

  - 10 reliability bins x (count, sum-confidence, sum-positives)   [30]
  - confusion counts tp/tn/fp/fn                                   [4]
  - per-threshold tpu/tnu/fpu/fnu x 11 thresholds                  [44]

Each grid step writes its partial sums as one 128-lane row; the (grid, 128)
partials are reduced by XLA afterwards (no cross-program accumulation, no
races). Bin ids use the same bit-exact float64-edge comparisons as
rcu_tpu.ops.calibration.

Numerics note: partials accumulate in f32 per ~128k-voxel block, then reduce
over blocks — a tighter summation tree than one flat f32 sum, so counts match
int-exact oracles for BraTS-sized volumes.

MEASURED RESULT (v5e, 155x240x240 volume, device-resident): this kernel runs
at 149 ms/volume vs 6.3 ms/volume for the XLA-fused lax path in
rcu_tpu/eval/kernels.py — the 78 sequential whole-block VPU reductions here
lose badly to XLA's own fusion of the one-hot contraction. The lax path is
therefore the production path; this kernel is kept as a validated example of
the single-pass formulation ("let XLA fuse — don't hand-schedule what the
compiler already does"). Both paths are equivalence-tested against each other.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 10
LANES = 128
BLOCK_ROWS = 256  # 256x128 = 32k voxels per grid step

# packed output layout (one 128-lane row per grid step):
#   [0, 30):  interleaved (count, conf_sum, true_sum) triplets per bin
#   [30, 34): tp, tn, fp, fn
#   [34, 34 + 4*T): (tpu, tnu, fpu, fnu) per threshold
_OFF_CONFUSION = 3 * N_BINS
_OFF_THRESH = 3 * N_BINS + 4
MAX_THRESHOLDS = (LANES - _OFF_THRESH) // 4  # 23 with 128 lanes


def _make_kernel(thresholds: tuple):
    from rcu_tpu.ops.calibration import bin_ids  # plain elementwise jnp —
    # the single source of the bit-exact digitize semantics (CLAUDE.md invariant)

    def kernel(fg_ref, tgt_ref, pred_ref, unc_ref, w_ref, out_ref):
        fg = fg_ref[...]
        tgt = tgt_ref[...]
        pred = pred_ref[...]
        unc = unc_ref[...]
        w = w_ref[...]

        sums = []
        ids = bin_ids(fg, N_BINS)
        for k in range(N_BINS):
            sel = jnp.where(ids == k, w, 0.0)
            sums.append(jnp.sum(sel))
            sums.append(jnp.sum(sel * fg))
            sums.append(jnp.sum(sel * tgt))

        tp_m = tgt * pred
        fp_m = (1.0 - tgt) * pred
        fn_m = tgt * (1.0 - pred)
        tn_m = (1.0 - tgt) * (1.0 - pred)
        for m in (tp_m, tn_m, fp_m, fn_m):
            sums.append(jnp.sum(m))

        for th in thresholds:
            um = jnp.where(unc > np.float32(th), 1.0, 0.0)
            for m in (tp_m, tn_m, fp_m, fn_m):
                sums.append(jnp.sum(m * um))

        packed = jnp.stack(sums)  # (30 + 4 + 4*T,)
        n = packed.shape[0]
        vec = jnp.pad(packed, (0, LANES - n))
        # output tile is (8, 128) for TPU tiling; data rides row 0
        out_ref[0, :, :] = jnp.zeros((8, LANES), jnp.float32)
        out_ref[0, 0, :] = vec

    return kernel


@functools.partial(jax.jit, static_argnames=("thresholds", "interpret"))
def fused_eval_stats(fg, target, prediction, uncertainty, weight,
                     thresholds: tuple, interpret: bool = False):
    """One-pass eval statistics.

    All inputs flat-compatible arrays of identical shape; ``weight`` carries
    the foreground/padding mask as 0/1 (bin stats are weighted by it; the
    confusion/threshold sums intentionally are NOT, matching the reference:
    only ECE sees the mask, eval_uncertainty.py:141-173).

    Returns dict:
      bins_count/bins_conf_sum/bins_true_sum: (10,)
      tp/tn/fp/fn: scalars
      thresh_counts: (T, 4) — tpu/tnu/fpu/fnu per threshold
    """
    if len(thresholds) > MAX_THRESHOLDS:
        raise ValueError(f"at most {MAX_THRESHOLDS} thresholds fit the packed "
                         f"128-lane output row; got {len(thresholds)}")
    n = int(np.prod(fg.shape))
    rows = -(-n // LANES)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    padded = rows * LANES

    def prep(x, pad_value=0.0):
        flat = x.reshape(-1).astype(jnp.float32)
        return jnp.pad(flat, (0, padded - n),
                       constant_values=pad_value).reshape(rows, LANES)

    fg_p = prep(fg)
    tgt_p = prep(target)
    # pad prediction with 1 so padding lands in tp/fp... no: pad target=0,
    # prediction=0 -> padding counts as TN. Compensate after the kernel.
    pred_p = prep(prediction)
    unc_p = prep(uncertainty)
    w_p = prep(weight)

    kernel = _make_kernel(tuple(thresholds))
    grid = rows // BLOCK_ROWS
    partials = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0))] * 5,
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        interpret=interpret,
    )(fg_p, tgt_p, pred_p, unc_p, w_p)

    total = jnp.sum(partials, axis=(0, 1))

    bins = total[:3 * N_BINS].reshape(N_BINS, 3)
    out = {
        "bins_count": bins[:, 0],
        "bins_conf_sum": bins[:, 1],
        "bins_true_sum": bins[:, 2],
        "tp": total[_OFF_CONFUSION + 0],
        "tn": total[_OFF_CONFUSION + 1] - (padded - n),  # padding was TN
        "fp": total[_OFF_CONFUSION + 2],
        "fn": total[_OFF_CONFUSION + 3],
        "thresh_counts": total[_OFF_THRESH:_OFF_THRESH
                               + 4 * len(thresholds)].reshape(len(thresholds), 4),
    }
    # padding voxels had fg=0, w=0 -> no bin contribution; uncertainty=0 ->
    # tn&~thresholded for th>0, so tnu needs no fix for our thresholds (>0),
    # but tn-derived tnu would include padding when th < 0; thresholds are
    # always > 0 here.
    return out


def fused_subject_eval(fg, target, prediction, uncertainty, mask,
                       thresholds, interpret: bool = False):
    """Drop-in producer for everything the eval actions need, derived from the
    single fused pass. Returns (ece_bins_dict, confusion_dict, correction_dict)
    compatible with eval/kernels.py consumers."""
    from rcu_tpu.ops.calibration import _bin_proportions
    from rcu_tpu.ops.metrics import dice_from_counts
    from rcu_tpu.ops.uncertainty import _correction_from_counts

    weight = mask if mask is not None else jnp.ones_like(fg)
    stats = fused_eval_stats(fg, target, prediction, uncertainty, weight,
                             tuple(float(t) for t in thresholds), interpret)

    bin_total = stats["bins_count"]
    nonzero = bin_total > 0
    safe = jnp.where(nonzero, bin_total, 1.0)
    mean_conf = jnp.where(nonzero, stats["bins_conf_sum"] / safe, 0.0)
    pos_frac = jnp.where(nonzero, stats["bins_true_sum"] / safe, 0.0)
    proportions = _bin_proportions("proportion", bin_total, nonzero, 1)
    ece = jnp.sum(jnp.abs(mean_conf - pos_frac) * proportions)
    bins = {"bins_count": bin_total, "bins_avg_confidence": mean_conf,
            "bins_positive_fraction": pos_frac, "bins_non_zero": nonzero,
            "ece": ece}

    tp, tn, fp, fn = stats["tp"], stats["tn"], stats["fp"], stats["fn"]
    confusion = {"tp": tp, "tn": tn, "fp": fp, "fn": fn, "n": tp + tn + fp + fn,
                 "dice": dice_from_counts(tp, fp, fn)}

    def one(counts_row):
        tpu, tnu, fpu, fnu = counts_row
        return _correction_from_counts((tp, tn, fp, fn, tpu, tnu, fpu, fnu))

    correction = jax.vmap(one)(stats["thresh_counts"])
    return bins, confusion, correction
