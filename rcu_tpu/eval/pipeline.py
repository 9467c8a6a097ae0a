"""Fused whole-volume pipeline: T-sample MC-dropout inference + calibration/
uncertainty eval as ONE jitted XLA program.

The strategy/test loops compose per-batch predicts with the fused eval
kernels (7+ dispatches per volume); this module compiles the entire
volume-level workload — ``lax.scan`` over slice batches of the volume, then
the calibration-bin and 11-threshold correction reductions — into a single
program. One dispatch per volume means no host round-trips on the hot path
(the remote-TPU tunnel makes per-dispatch latency expensive) and XLA can
schedule the eval reductions to overlap the tail of the conv work.

Reference semantics covered in one program: McPredictStep +
MultiPredictionSummary (rechun/dl/customsteps.py), the normalized-entropy
preparation (rechun/eval/analysis.py:201) and the EceCalibrationAction /
CorrectionAction metric passes (bin-eval/eval_uncertainty.py:112-138,176-202).

Program factories:
- :func:`make_volume_mc_eval_fn`  — the headline: MC scan + eval reductions
  (``artifacts=False`` drops the per-voxel outputs for the direct CSV path);
- :func:`make_volume_mc_fn`       — inference-only (serving);
- :func:`make_image_batch_mc_eval_fn` — native-2D: K whole images per
  dispatch with per-image eval reductions vmapped;
- :func:`make_volume_sigma_minmax_fn` / :func:`make_volume_aleatoric_eval_fn`
  — the two passes of the direct aleatoric (sigma) protocol.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rcu_tpu.ops import calibration as cal_ops
from rcu_tpu.ops import metrics as metrics_ops
from rcu_tpu.ops import uncertainty as u_ops


def _mc_scan(model, mc_steps, params, batch_stats, batched, rng):
    """lax.scan of the 21-forward MC protocol over a volume's slice batches.
    Returns per-slice (fg_prob, normalized_entropy, weight_scaling_fg), each
    (n_batches, batch, H, W)."""
    variables = {"params": params, "batch_stats": batch_stats}

    from rcu_tpu.engine.steps import mc_forward

    def one_batch(_, inp):
        images, batch_index = inp
        key = jax.random.fold_in(rng, batch_index)

        # weight-scaling forward (the reference protocol's 21st forward,
        # customsteps.py:23-25; kept so the workload stays comparable)
        ws_out = model.apply(variables, images, train=False)
        ws_fg = jax.nn.softmax(ws_out.logits, axis=-1)[..., 1]

        # shares the MC-deterministic encoder prefix across the T samples
        # for dropout_center models (steps.mc_forward)
        mc_probs = mc_forward(model, variables, images, key, mc_steps)
        probabilities = jnp.mean(mc_probs, axis=0)
        ent = metrics_ops.entropy(probabilities, axis=-1)
        return None, (probabilities[..., 1], ent, ws_fg)

    n_batches = batched.shape[0]
    _, out = jax.lax.scan(one_batch, None, (batched, jnp.arange(n_batches)))
    return out


def _volume_shardings(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep = NamedSharding(mesh, P())
    # scan axis unsharded, each step's batch axis sharded over the data axis
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    return rep, data


def make_volume_mc_fn(model, mc_steps: int, batch_size: int,
                      vol_slices: int, mesh=None):
    """Inference-only variant of :func:`make_volume_mc_eval_fn` — one
    dispatch (params, batch_stats, batched_volume, rng) -> the per-voxel
    serving artifacts {fg, entropy, ws_fg, prediction} with no eval
    reductions (no ground truth required). Same PRNG schedule as the eval
    variant, so fg/entropy match it bitwise."""

    def run(params, batch_stats, batched, rng):
        fg, ent, ws_fg = _mc_scan(model, mc_steps, params, batch_stats,
                                  batched, rng)
        fg = fg.reshape((-1,) + fg.shape[2:])[:vol_slices]
        ent = ent.reshape((-1,) + ent.shape[2:])[:vol_slices] / jnp.log(2.0)
        ws_fg = ws_fg.reshape((-1,) + ws_fg.shape[2:])[:vol_slices]
        return {"fg": fg, "entropy": ent, "ws_fg": ws_fg,
                "prediction": fg > 0.5}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data, rep),
                   out_shardings=rep)


def _aleatoric_scan(model, is_log_sigma, params, batch_stats, batched):
    """One deterministic forward per slice batch -> per-slice (prediction,
    predicted-class sigma), via lax.scan over steps.aleatoric_forward (the
    single home of the sigma-protocol math)."""
    from rcu_tpu.engine.steps import aleatoric_forward
    variables = {"params": params, "batch_stats": batch_stats}

    def one_batch(_, images):
        _, _, prediction, predicted_sigma = aleatoric_forward(
            model, variables, images, is_log_sigma)
        return None, (prediction.astype(jnp.uint8), predicted_sigma)

    _, out = jax.lax.scan(one_batch, None, batched)
    return out


def make_volume_sigma_minmax_fn(model, batch_size: int, vol_slices: int,
                                is_log_sigma: bool, mesh=None):
    """Pass A of the direct aleatoric eval: (params, batch_stats, batched) ->
    (min, max) of the subject's predicted-class sigma — the per-subject
    contribution to the run's GLOBAL rescale bounds (the staged pipeline's
    minmax action over the _sigma artifacts)."""

    def run(params, batch_stats, batched):
        _, sigma = _aleatoric_scan(model, is_log_sigma, params, batch_stats,
                                   batched)
        sigma = sigma.reshape((-1,) + sigma.shape[2:])[:vol_slices]
        return jnp.min(sigma), jnp.max(sigma)

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data), out_shardings=rep)


def make_volume_aleatoric_eval_fn(model, batch_size: int, vol_slices: int,
                                  is_log_sigma: bool, mesh=None):
    """Pass B of the direct aleatoric eval — one dispatch per subject:
    (params, batch_stats, batched, target, mask, thresholds, sigma_min,
    sigma_max) -> the eval dict. Semantics mirror the staged sigma run with
    ``rescale_sigma='global'``: sigma -> rescale_linear(global bounds, eps
    1e-5) -> fold into foreground probabilities by prediction -> masked
    ECE/bins; the rescaled sigma is the correction pass's uncertainty."""
    from rcu_tpu.ops import prepare as prep_ops

    def run(params, batch_stats, batched, target, mask, thresholds,
            sigma_min, sigma_max):
        prediction, sigma = _aleatoric_scan(model, is_log_sigma, params,
                                            batch_stats, batched)
        prediction = prediction.reshape(
            (-1,) + prediction.shape[2:])[:vol_slices]
        sigma = sigma.reshape((-1,) + sigma.shape[2:])[:vol_slices]
        rescaled = prep_ops.rescale_linear(sigma, sigma_min, sigma_max)
        folded = prep_ops.uncertainty_to_foreground_probabilities(rescaled,
                                                                  prediction)
        ece, bins = cal_ops.ece_binary_with_bins(folded, target, mask)
        correction = u_ops.correction_eval(prediction, target, rescaled,
                                           thresholds)
        return {"ece": ece, **bins, "dice": correction["dice"][0],
                "correction": correction}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data) + (rep,) * 5,
                   out_shardings=rep)


def make_image_batch_mc_eval_fn(model, mc_steps: int, mesh=None):
    """Native-2D (ISIC) batched program: ONE dispatch runs the 21-forward MC
    protocol over K whole images at once (K rides the conv batch axis — full
    MXU utilization instead of the volume path's forced batch of 1) and then
    computes every image's OWN eval reductions via vmap.

    (params, batch_stats, images[K,H,W,C], targets[K,H,W], masks[K,H,W],
    thresholds, rng) -> dict of per-image arrays: ece/bins (K,...), dice (K,),
    correction entries (K, n_thresholds).
    """

    def run(params, batch_stats, images, targets, masks, thresholds, rng):
        fg, ent, _ws = _mc_scan(model, mc_steps, params, batch_stats,
                                images[None], rng)
        fg = fg[0]                      # (K, H, W)
        ent = ent[0] / jnp.log(2.0)

        def one_image(fg_i, ent_i, target_i, mask_i):
            ece, bins = cal_ops.ece_binary_with_bins(fg_i, target_i, mask_i)
            prediction = fg_i > 0.5
            correction = u_ops.correction_eval(prediction, target_i, ent_i,
                                               thresholds)
            dice = correction["dice"][0]  # threshold-independent entry
            return {"ece": ece, **bins, "dice": dice, "correction": correction}

        return jax.vmap(one_image)(fg, ent, targets, masks)

    if mesh is None:
        return jax.jit(run)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))  # images sharded over the mesh
    return jax.jit(run, in_shardings=(rep, rep, data, data, data, rep, rep),
                   out_shardings=rep)


def make_volume_mc_eval_fn(model, mc_steps: int, batch_size: int,
                           vol_slices: int, mesh=None,
                           artifacts: bool = True):
    """One-dispatch (params, batch_stats, batched_volume, target, mask,
    thresholds, rng) -> eval dict for a padded volume.

    ``artifacts=False`` drops the per-voxel outputs (fg/entropy/ws_fg) from
    the program's results — callers that only consume the eval reductions
    (the direct CSV path) then don't hold ~100 MB of dead volume buffers per
    in-flight subject, and under a mesh XLA skips their output all-gather.

    ``batched_volume`` is (n_batches, batch_size, H, W, C) — the true
    ``vol_slices`` slices in row-major order followed by padding; target/mask
    are (vol_slices, H, W). The per-batch PRNG schedule is
    ``fold_in(rng, batch_index)``, identical to the composed per-batch path,
    so outputs match it bitwise.

    With ``mesh``, each scanned step's batch axis is sharded over the mesh's
    data axis and the eval reductions run on the sharded outputs — the
    whole-volume program stays a single dispatch across all chips.
    """

    def run(params, batch_stats, batched, target, mask, thresholds, rng):
        fg, ent, ws_fg = _mc_scan(model, mc_steps, params, batch_stats,
                                  batched, rng)
        fg = fg.reshape((-1,) + fg.shape[2:])[:vol_slices]
        ent = ent.reshape((-1,) + ent.shape[2:])[:vol_slices] / jnp.log(2.0)
        ws_fg = ws_fg.reshape((-1,) + ws_fg.shape[2:])[:vol_slices]
        prediction = fg > 0.5

        ece, bins = cal_ops.ece_binary_with_bins(fg, target, mask)
        correction = u_ops.correction_eval(prediction, target, ent, thresholds)
        out = {"ece": ece, **bins, "correction": correction}
        if artifacts:
            out.update(fg=fg, entropy=ent, ws_fg=ws_fg)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data, rep, rep, rep, rep),
                   out_shardings=rep)
