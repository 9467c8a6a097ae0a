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

Program factories (one per strategy family x dataset dimensionality; all
eight reference strategies have a direct fused program):
- :func:`make_volume_mc_eval_fn`  — the headline: MC scan + eval reductions
  (``artifacts=False`` drops the per-voxel outputs for the direct CSV path;
  ``mc_steps=0`` is the deterministic baseline/center protocol);
- :func:`make_volume_mc_fn`       — inference-only (serving);
- :func:`make_image_batch_mc_eval_fn` — native-2D: K whole images per
  dispatch with per-image eval reductions vmapped;
- :func:`make_volume_sigma_minmax_fn` / :func:`make_volume_aleatoric_eval_fn`
  — the two passes of the direct aleatoric (sigma) protocol;
- :func:`make_image_batch_sigma_minmax_fn` /
  :func:`make_image_batch_aleatoric_eval_fn` — their native-2D twins;
- :func:`make_volume_ensemble_eval_fn` / :func:`make_image_batch_ensemble_eval_fn`
  — stacked-member ensembles (EP over a 2-D mesh's 'model' axis);
- :func:`make_volume_aux_feat_eval_fn` / :func:`make_image_batch_aux_feat_eval_fn`
  — frozen segmenter + PostNet in ONE program (confidence protocol);
- :func:`make_volume_aux_segm_eval_fn` / :func:`make_image_batch_aux_segm_eval_fn`
  — the error-net strategy (baseline prediction rides the labels).
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
    (n_batches, batch, H, W). ``mc_steps=0`` is the deterministic protocol
    (baseline/center runs without ``others.mc``): the single weight-scaling
    forward IS the probability map, exactly as the staged
    SegmentationPredictStep writes it.

    ``rng`` is either a single ``(2,)`` key — batch ``i`` samples with
    ``fold_in(rng, i)``, the volume path's schedule — or an explicit
    ``(n_batches, 2)`` per-batch key array (the chunked 2-D driver passes
    keys derived from each chunk's GLOBAL image offset, making the MC
    stream invariant to how chunks are grouped into dispatches)."""
    variables = {"params": params, "batch_stats": batch_stats}

    from rcu_tpu.engine.steps import mc_forward

    per_batch_keys = getattr(rng, "ndim", 1) == 2

    def one_batch(_, inp):
        images, batch_index = inp
        key = rng[batch_index] if per_batch_keys \
            else jax.random.fold_in(rng, batch_index)

        # weight-scaling forward (the reference protocol's 21st forward,
        # customsteps.py:23-25; kept so the workload stays comparable)
        ws_out = model.apply(variables, images, train=False)
        ws_probs = jax.nn.softmax(ws_out.logits, axis=-1)

        if mc_steps:
            # shares the MC-deterministic encoder prefix across the T samples
            # for dropout_center models (steps.mc_forward)
            mc_probs = mc_forward(model, variables, images, key, mc_steps)
            probabilities = jnp.mean(mc_probs, axis=0)
        else:
            probabilities = ws_probs
        ent = metrics_ops.entropy(probabilities, axis=-1)
        return None, (probabilities[..., 1], ent, ws_probs[..., 1])

    n_batches = batched.shape[0]
    _, out = jax.lax.scan(one_batch, None, (batched, jnp.arange(n_batches)))
    return out


def _trim(x, vol_slices: int):
    """(n_batches, batch, ...) scan output -> the true (vol_slices, ...)."""
    return x.reshape((-1,) + x.shape[2:])[:vol_slices]


def _confusion(prediction, target):
    """The ece_dice pass's unmasked confusion row (staged
    kernels.ece_dice_confusion counterpart): tp/tn/fp/fn/n scalars."""
    tp, tn, fp, fn, n = metrics_ops.confusion_counts(prediction, target)
    return {"tp": tp, "tn": tn, "fp": fp, "fn": fn, "n": n}


def _entropy_eval(fg, ent, target, mask, thresholds):
    """Shared eval reductions of the 'probabilities' confidence-entry
    protocol (baseline/center/mc/ensemble): ECE bins on the fg probability
    map (masked), 11-threshold correction on the normalized entropy, the
    unmasked confusion row (the ece_dice CSV family), plus the run-minmax
    contribution of the confidence entry."""
    prediction = fg > 0.5
    ece, bins = cal_ops.ece_binary_with_bins(fg, target, mask)
    correction = u_ops.correction_eval(prediction, target, ent, thresholds)
    return {"ece": ece, **bins, "dice": correction["dice"][0],
            "correction": correction, **_confusion(prediction, target),
            "conf_min": jnp.min(fg), "conf_max": jnp.max(fg)}


def _confidence_eval(confidence, prediction, target, mask, thresholds):
    """Shared eval reductions of the 'confidence' entry protocol (auxiliary
    feat/segm): subject min-max rescale, fold into foreground probabilities
    by the prediction artifact, masked ECE bins; the correction pass consumes
    the SUBJECT-rescaled confidence (the runner's bnf_ue wiring,
    eval/actions.py _PASS_BUILDERS: rescale_confidence='subject'), so both
    CSV families carry the ``_rescale`` result-id suffix."""
    from rcu_tpu.ops import prepare as prep_ops
    rescaled = prep_ops.rescale_subject_min_max(confidence)
    folded = prep_ops.uncertainty_to_foreground_probabilities(rescaled,
                                                              prediction)
    ece, bins = cal_ops.ece_binary_with_bins(folded, target, mask)
    correction = u_ops.correction_eval(prediction, target, rescaled,
                                       thresholds)
    return {"ece": ece, **bins, "dice": correction["dice"][0],
            "correction": correction, **_confusion(prediction, target),
            "conf_min": jnp.min(confidence), "conf_max": jnp.max(confidence)}


def _volume_shardings(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep = NamedSharding(mesh, P())
    # scan axis unsharded, each step's batch axis sharded over the data axis
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    return rep, data


def staging_shardings(mesh):
    """The in_shardings the direct driver pre-stages uploads onto from its
    loader threads (eval/direct.py): ``(replicated, volume scan-batch data,
    image-batch data)``. Single source of truth with the programs' own
    ``in_shardings`` (:func:`_volume_shardings` / :func:`_jit_image_batch`)
    — if a program's layout ever changes, pre-staging follows and dispatch
    never silently re-shards a pre-committed array."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep, vol_data = _volume_shardings(mesh)
    return rep, vol_data, NamedSharding(mesh, P(DATA_AXIS))


def _member_sharding(mesh):
    """Stacked ensemble members shard over the 'model' axis when the mesh has
    one (EP; the member-mean becomes an XLA all-reduce over that axis),
    otherwise they replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.ensemble import MODEL_AXIS
    if MODEL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(MODEL_AXIS))
    return NamedSharding(mesh, P())


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
        fg = _trim(fg, vol_slices)
        ent = _trim(ent, vol_slices) / jnp.log(2.0)
        ws_fg = _trim(ws_fg, vol_slices)
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
                                  is_log_sigma: bool, mesh=None,
                                  artifacts: bool = False):
    """Pass B of the direct aleatoric eval — one dispatch per subject:
    (params, batch_stats, batched, target, mask, thresholds, sigma_min,
    sigma_max) -> the eval dict. Semantics mirror the staged sigma run with
    ``rescale_sigma='global'``: sigma -> rescale_linear(global bounds, eps
    1e-5) -> fold into foreground probabilities by prediction -> masked
    ECE/bins; the rescaled sigma is the correction pass's uncertainty.
    ``artifacts=True`` additionally returns the per-voxel serving payload
    (prediction, raw predicted-class sigma, folded confidence map)."""
    from rcu_tpu.ops import prepare as prep_ops

    def run(params, batch_stats, batched, target, mask, thresholds,
            sigma_min, sigma_max):
        prediction, sigma = _aleatoric_scan(model, is_log_sigma, params,
                                            batch_stats, batched)
        prediction = _trim(prediction, vol_slices)
        sigma = _trim(sigma, vol_slices)
        rescaled = prep_ops.rescale_linear(sigma, sigma_min, sigma_max)
        folded = prep_ops.uncertainty_to_foreground_probabilities(rescaled,
                                                                  prediction)
        ece, bins = cal_ops.ece_binary_with_bins(folded, target, mask)
        correction = u_ops.correction_eval(prediction, target, rescaled,
                                           thresholds)
        out = {"ece": ece, **bins, "dice": correction["dice"][0],
               "correction": correction,
               **_confusion(prediction, target)}
        if artifacts:
            out.update(prediction=prediction, sigma=sigma, confidence=folded)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data) + (rep,) * 5,
                   out_shardings=rep)


def make_volume_aleatoric_fn(model, batch_size: int, vol_slices: int,
                             is_log_sigma: bool, mesh=None):
    """Inference-only aleatoric serving program: (params, batch_stats,
    batched) -> {fg, prediction, sigma} per voxel — the deterministic softmax
    foreground, its argmax, and the UNRESCALED predicted-class sigma (global
    rescale is a run-level two-pass protocol; clients either collect bounds
    over their own fleet of requests or pass them with a scored request)."""
    from rcu_tpu.engine.steps import aleatoric_forward

    def run(params, batch_stats, batched):
        variables = {"params": params, "batch_stats": batch_stats}

        def one_batch(_, images):
            probabilities, _, prediction, predicted_sigma = aleatoric_forward(
                model, variables, images, is_log_sigma)
            return None, (probabilities[..., 1],
                          prediction.astype(jnp.uint8), predicted_sigma)

        _, (fg, pred, sigma) = jax.lax.scan(one_batch, None, batched)
        return {"fg": _trim(fg, vol_slices),
                "prediction": _trim(pred, vol_slices),
                "sigma": _trim(sigma, vol_slices)}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data), out_shardings=rep)


def make_image_batch_mc_eval_fn(model, mc_steps: int, mesh=None,
                                n_chunks: int = 1):
    """Native-2D (ISIC) batched program: ONE dispatch runs the 21-forward MC
    protocol over K whole images at once (K rides the conv batch axis — full
    MXU utilization instead of the volume path's forced batch of 1) and then
    computes every image's OWN eval reductions via vmap.

    (params, batch_stats, images[K,H,W,C], targets[K,H,W], masks[K,H,W],
    thresholds, rng) -> dict of per-image arrays: ece/bins (K,...), dice (K,),
    correction entries (K, n_thresholds).

    ``n_chunks > 1`` scans that many K-image chunks inside the SAME dispatch
    (images become [n_chunks*K, ...]) — the dispatch-amortization lever for
    the remote-TPU link, where a single K=32 chunk is ~0.2 s of device work
    and the per-dispatch round trip would otherwise dominate (see
    scripts/bench_isic.py). ``rng`` may be a single ``(2,)`` key (chunk
    ``i`` samples with ``fold_in(rng, i)`` — the serving path) or an
    ``(n_chunks, 2)`` per-chunk key array (the direct driver passes
    global-offset-derived keys so the MC stream does not depend on
    ``dispatch_chunks`` grouping). ``n_chunks=1`` with a single key is
    bit-identical to the historical single-chunk program.
    """

    def run(params, batch_stats, images, targets, masks, thresholds, rng):
        batched = images.reshape((n_chunks, -1) + images.shape[1:])
        fg, ent, _ws = _mc_scan(model, mc_steps, params, batch_stats,
                                batched, rng)
        fg = fg.reshape((-1,) + fg.shape[2:])        # (n_chunks*K, H, W)
        ent = ent.reshape((-1,) + ent.shape[2:]) / jnp.log(2.0)

        def one_image(fg_i, ent_i, target_i, mask_i):
            return _entropy_eval(fg_i, ent_i, target_i, mask_i, thresholds)

        return jax.vmap(one_image)(fg, ent, targets, masks)

    return _jit_image_batch(run, mesh, n_state=2, n_data=3, n_tail=2)


def _jit_image_batch(run, mesh, n_state: int, n_data: int, n_tail: int,
                     member_argnums=()):
    """jit a chunked native-2D program: ``n_state`` leading parameter trees
    (replicated, or 'model'-axis sharded for ``member_argnums``), ``n_data``
    per-image arrays sharded on their leading image axis, ``n_tail``
    replicated trailing args (thresholds/rng/bounds)."""
    if mesh is None:
        return jax.jit(run)
    rep, _, data = staging_shardings(mesh)  # images sharded over the mesh
    member = _member_sharding(mesh)
    lead = tuple(member if i in member_argnums else rep
                 for i in range(n_state))
    return jax.jit(run, in_shardings=lead + (data,) * n_data + (rep,) * n_tail,
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
        fg = _trim(fg, vol_slices)
        ent = _trim(ent, vol_slices) / jnp.log(2.0)
        ws_fg = _trim(ws_fg, vol_slices)
        out = _entropy_eval(fg, ent, target, mask, thresholds)
        if artifacts:
            out.update(fg=fg, entropy=ent, ws_fg=ws_fg)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data, rep, rep, rep, rep),
                   out_shardings=rep)


# ---------------------------------------------------------------------------
# ensemble (stacked members; reference brats_test_ensemble.py:72-94 protocol)
# ---------------------------------------------------------------------------

def _ensemble_scan(model, stacked_params, stacked_stats, batched):
    """lax.scan over slice batches; per batch all K members run as one vmap
    and the member-mean probabilities feed the entropy protocol (reference
    MultiPredictionSummary over the sequential member loop)."""

    def one_batch(_, images):
        def one(params, batch_stats):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              images, train=False)
            return jax.nn.softmax(out.logits, axis=-1)

        member_probs = jax.vmap(one)(stacked_params, stacked_stats)
        probabilities = jnp.mean(member_probs, axis=0)
        ent = metrics_ops.entropy(probabilities, axis=-1)
        return None, (probabilities[..., 1], ent)

    _, out = jax.lax.scan(one_batch, None, batched)
    return out


def _ensemble_scan_ep(model, mesh, stacked_params, stacked_stats, batched):
    """EP twin of :func:`_ensemble_scan`: the member axis is mapped with an
    EXPLICIT ``shard_map`` over the mesh's 'model' axis (each shard runs its
    local members' convs unpartitioned; the member-mean is one psum), while
    the batch axis stays a compiler-sharded (GSPMD) dimension like every
    proven data-parallel path.

    Explicit, not auto: letting GSPMD partition the vmapped member axis of a
    conv CHAIN miscompiles on this jax/XLA build — measured round 4, each
    member-batched conv is exact in isolation but chaining two diverges by
    O(1) (e.g. member-mean probabilities off by 0.5 at trained parameter
    scale; see tests/test_parallel.py TestEnsembleParallel). shard_map maps
    the member dimension the way a TPU program should anyway — one member
    per model-axis shard, collective only at the mean."""
    from rcu_tpu.parallel.ensemble import MODEL_AXIS
    P = jax.sharding.PartitionSpec
    n_members = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

    def body(local_params, local_stats, local_batched):
        def one_member(params, batch_stats):
            def one_batch(_, images):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats}, images,
                    train=False)
                return None, jax.nn.softmax(out.logits, axis=-1)

            _, probs = jax.lax.scan(one_batch, None, local_batched)
            return probs

        local_probs = jax.vmap(one_member)(local_params, local_stats)
        probabilities = jax.lax.psum(jnp.sum(local_probs, axis=0),
                                     MODEL_AXIS) / n_members
        ent = metrics_ops.entropy(probabilities, axis=-1)
        return probabilities[..., 1], ent

    member = P(MODEL_AXIS)
    return jax.shard_map(body, mesh=mesh,
                         axis_names=frozenset({MODEL_AXIS}),
                         in_specs=(member, member, P()),
                         out_specs=(P(), P()))(stacked_params, stacked_stats,
                                               batched)


def _is_ep_mesh(mesh) -> bool:
    from rcu_tpu.parallel.ensemble import MODEL_AXIS
    return mesh is not None and MODEL_AXIS in mesh.axis_names


def _ensemble_probs_scan(model, mesh, stacked_params, stacked_stats, batched):
    """Member-mean (fg, entropy) per scanned batch — EP shard_map when the
    mesh has a 'model' axis, plain vmapped scan otherwise (members then
    replicate; GSPMD handles replicated members exactly)."""
    if _is_ep_mesh(mesh):
        return _ensemble_scan_ep(model, mesh, stacked_params, stacked_stats,
                                 batched)
    return _ensemble_scan(model, stacked_params, stacked_stats, batched)


def make_volume_ensemble_eval_fn(model, batch_size: int, vol_slices: int,
                                 mesh=None, artifacts: bool = False):
    """One dispatch per subject: (stacked_params, stacked_batch_stats,
    batched, target, mask, thresholds) -> eval dict via the member-mean +
    entropy protocol. On a 2-D mesh the member stack shards over the 'model'
    axis (EP) and each step's batch axis over 'data'. ``artifacts=True``
    additionally returns the per-voxel fg/entropy maps (serving)."""

    def run(stacked_params, stacked_stats, batched, target, mask, thresholds):
        fg, ent = _ensemble_probs_scan(model, mesh, stacked_params,
                                       stacked_stats, batched)
        fg = _trim(fg, vol_slices)
        ent = _trim(ent, vol_slices) / jnp.log(2.0)
        out = _entropy_eval(fg, ent, target, mask, thresholds)
        if artifacts:
            out.update(fg=fg, entropy=ent)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    member = _member_sharding(mesh)
    return jax.jit(run, in_shardings=(member, member, data) + (rep,) * 3,
                   out_shardings=rep)


def make_volume_ensemble_fn(model, batch_size: int, vol_slices: int,
                            mesh=None):
    """Inference-only ensemble serving program: (stacked_params,
    stacked_batch_stats, batched) -> {fg, entropy, prediction} per voxel
    (member-mean probabilities; EP over a 2-D mesh's 'model' axis)."""

    def run(stacked_params, stacked_stats, batched):
        fg, ent = _ensemble_probs_scan(model, mesh, stacked_params,
                                       stacked_stats, batched)
        fg = _trim(fg, vol_slices)
        ent = _trim(ent, vol_slices) / jnp.log(2.0)
        return {"fg": fg, "entropy": ent, "prediction": fg > 0.5}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    member = _member_sharding(mesh)
    return jax.jit(run, in_shardings=(member, member, data),
                   out_shardings=rep)


def make_image_batch_ensemble_eval_fn(model, mesh=None):
    """Chunked native-2D ensemble eval: K whole images per dispatch, all
    members vmapped, per-image eval reductions vmapped."""

    def run(stacked_params, stacked_stats, images, targets, masks, thresholds):
        fg, ent = _ensemble_probs_scan(model, mesh, stacked_params,
                                       stacked_stats, images[None])
        fg = fg[0]
        ent = ent[0] / jnp.log(2.0)

        def one_image(fg_i, ent_i, target_i, mask_i):
            return _entropy_eval(fg_i, ent_i, target_i, mask_i, thresholds)

        return jax.vmap(one_image)(fg, ent, targets, masks)

    return _jit_image_batch(run, mesh, n_state=2, n_data=3, n_tail=1,
                            member_argnums=(0, 1))


# ---------------------------------------------------------------------------
# auxiliary feat./segm. (confidence protocol; reference
# brats_test_auxiliary_feat.py:89-129 / brats_test_auxiliary_segm.py:68-120)
# ---------------------------------------------------------------------------

def _aux_feat_scan(segm_model, post_model, segm_params, segm_stats,
                   post_params, post_stats, batched):
    """Frozen segmenter (provide_features) + PostNet per slice batch -> per-
    slice (confidence fg, segmenter argmax prediction) — the two artifacts
    the staged auxiliary-feat test writes, fused into one program."""

    def one_batch(_, images):
        segm_out = segm_model.apply(
            {"params": segm_params, "batch_stats": segm_stats}, images,
            train=False)
        prediction = jnp.argmax(segm_out.logits, axis=-1).astype(jnp.uint8)
        post_out = post_model.apply(
            {"params": post_params, "batch_stats": post_stats},
            segm_out.features, train=False)
        confidence = jax.nn.softmax(post_out.logits, axis=-1)[..., 1]
        return None, (confidence, prediction)

    _, out = jax.lax.scan(one_batch, None, batched)
    return out


def make_volume_aux_feat_eval_fn(segm_model, post_model, batch_size: int,
                                 vol_slices: int, mesh=None,
                                 artifacts: bool = False):
    """One dispatch per subject: (segm_params, segm_stats, post_params,
    post_stats, batched, target, mask, thresholds) -> confidence-protocol
    eval dict (``_rescale`` result ids). ``artifacts=True`` additionally
    returns the per-voxel serving payload (confidence, prediction)."""

    def run(segm_params, segm_stats, post_params, post_stats, batched,
            target, mask, thresholds):
        conf, pred = _aux_feat_scan(segm_model, post_model, segm_params,
                                    segm_stats, post_params, post_stats,
                                    batched)
        conf = _trim(conf, vol_slices)
        pred = _trim(pred, vol_slices)
        out = _confidence_eval(conf, pred, target, mask, thresholds)
        if artifacts:
            out.update(confidence=conf, prediction=pred)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep,) * 4 + (data,) + (rep,) * 3,
                   out_shardings=rep)


def make_volume_aux_feat_fn(segm_model, post_model, batch_size: int,
                            vol_slices: int, mesh=None):
    """Inference-only auxiliary-feat serving program: (segm_params,
    segm_stats, post_params, post_stats, batched) -> {confidence,
    prediction} per voxel (PostNet fg + frozen-segmenter argmax — the two
    staged artifacts)."""

    def run(segm_params, segm_stats, post_params, post_stats, batched):
        conf, pred = _aux_feat_scan(segm_model, post_model, segm_params,
                                    segm_stats, post_params, post_stats,
                                    batched)
        return {"confidence": _trim(conf, vol_slices),
                "prediction": _trim(pred, vol_slices)}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep,) * 4 + (data,),
                   out_shardings=rep)


def make_image_batch_aux_feat_eval_fn(segm_model, post_model, mesh=None):
    """Chunked native-2D auxiliary-feat eval (per-image subject rescale)."""

    def run(segm_params, segm_stats, post_params, post_stats, images,
            targets, masks, thresholds):
        conf, pred = _aux_feat_scan(segm_model, post_model, segm_params,
                                    segm_stats, post_params, post_stats,
                                    images[None])

        def one_image(conf_i, pred_i, target_i, mask_i):
            return _confidence_eval(conf_i, pred_i, target_i, mask_i,
                                    thresholds)

        return jax.vmap(one_image)(conf[0], pred[0], targets, masks)

    return _jit_image_batch(run, mesh, n_state=4, n_data=3, n_tail=1)


def _aux_segm_scan(model, params, batch_stats, batched, batched_baseline):
    """Error-net forward per slice batch: input = images concat the baseline
    prediction channel (labels carry [gt, prediction] in aux-segm stores)."""
    variables = {"params": params, "batch_stats": batch_stats}

    def one_batch(_, inp):
        images, baseline = inp
        inputs = jnp.concatenate(
            [images, baseline[..., None].astype(jnp.float32)], axis=-1)
        out = model.apply(variables, inputs, train=False)
        return None, jax.nn.softmax(out.logits, axis=-1)[..., 1]

    _, conf = jax.lax.scan(one_batch, None, (batched, batched_baseline))
    return conf


def make_volume_aux_segm_eval_fn(model, batch_size: int, vol_slices: int,
                                 mesh=None, artifacts: bool = False):
    """One dispatch per subject: (params, batch_stats, batched,
    batched_baseline, target, mask, thresholds) -> confidence-protocol eval
    dict; the prediction artifact is the BASELINE's passthrough prediction
    (reference brats_test_auxiliary_segm.py:68-69). ``artifacts=True``
    additionally returns the per-voxel confidence map."""

    def run(params, batch_stats, batched, batched_baseline, target, mask,
            thresholds):
        conf = _aux_segm_scan(model, params, batch_stats, batched,
                              batched_baseline)
        conf = _trim(conf, vol_slices)
        pred = _trim(batched_baseline, vol_slices).astype(jnp.uint8)
        out = _confidence_eval(conf, pred, target, mask, thresholds)
        if artifacts:
            out.update(confidence=conf, prediction=pred)
        return out

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data, data) + (rep,) * 3,
                   out_shardings=rep)


def make_volume_aux_segm_fn(model, batch_size: int, vol_slices: int,
                            mesh=None):
    """Inference-only auxiliary-segm serving program: (params, batch_stats,
    batched, batched_baseline) -> {confidence, prediction} per voxel (the
    error net's fg + the baseline passthrough)."""

    def run(params, batch_stats, batched, batched_baseline):
        conf = _aux_segm_scan(model, params, batch_stats, batched,
                              batched_baseline)
        return {"confidence": _trim(conf, vol_slices),
                "prediction": _trim(batched_baseline,
                                    vol_slices).astype(jnp.uint8)}

    if mesh is None:
        return jax.jit(run)
    rep, data = _volume_shardings(mesh)
    return jax.jit(run, in_shardings=(rep, rep, data, data),
                   out_shardings=rep)


def make_image_batch_aux_segm_eval_fn(model, mesh=None):
    """Chunked native-2D auxiliary-segm eval."""

    def run(params, batch_stats, images, baselines, targets, masks,
            thresholds):
        conf = _aux_segm_scan(model, params, batch_stats, images[None],
                              baselines[None])[0]

        def one_image(conf_i, base_i, target_i, mask_i):
            return _confidence_eval(conf_i, base_i.astype(jnp.uint8),
                                    target_i, mask_i, thresholds)

        return jax.vmap(one_image)(conf, baselines, targets, masks)

    return _jit_image_batch(run, mesh, n_state=2, n_data=4, n_tail=1)


# ---------------------------------------------------------------------------
# native-2D aleatoric (sigma protocol, chunked)
# ---------------------------------------------------------------------------

def make_image_batch_sigma_minmax_fn(model, is_log_sigma: bool, mesh=None):
    """Pass A of the chunked 2-D aleatoric eval: per-image (min, max) vectors
    of the predicted-class sigma — the host aggregates only the REAL images'
    bounds, so chunk padding cannot pollute the run's global rescale."""
    from rcu_tpu.engine.steps import aleatoric_forward

    def run(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        _, _, _, sigma = aleatoric_forward(model, variables, images,
                                           is_log_sigma)
        return jnp.min(sigma, axis=(1, 2)), jnp.max(sigma, axis=(1, 2))

    return _jit_image_batch(run, mesh, n_state=2, n_data=1, n_tail=0)


def make_image_batch_aleatoric_eval_fn(model, is_log_sigma: bool, mesh=None):
    """Pass B: per-image global-rescale + fold + eval, vmapped over the
    chunk: (params, batch_stats, images, targets, masks, thresholds,
    sigma_min, sigma_max) -> per-image eval arrays."""
    from rcu_tpu.engine.steps import aleatoric_forward
    from rcu_tpu.ops import prepare as prep_ops

    def run(params, batch_stats, images, targets, masks, thresholds,
            sigma_min, sigma_max):
        variables = {"params": params, "batch_stats": batch_stats}
        _, _, prediction, sigma = aleatoric_forward(model, variables, images,
                                                    is_log_sigma)
        prediction = prediction.astype(jnp.uint8)

        def one_image(pred_i, sigma_i, target_i, mask_i):
            rescaled = prep_ops.rescale_linear(sigma_i, sigma_min, sigma_max)
            folded = prep_ops.uncertainty_to_foreground_probabilities(
                rescaled, pred_i)
            ece, bins = cal_ops.ece_binary_with_bins(folded, target_i, mask_i)
            correction = u_ops.correction_eval(pred_i, target_i, rescaled,
                                               thresholds)
            return {"ece": ece, **bins, "dice": correction["dice"][0],
                    "correction": correction,
                    **_confusion(pred_i, target_i)}

        return jax.vmap(one_image)(prediction, sigma, targets, masks)

    return _jit_image_batch(run, mesh, n_state=2, n_data=3, n_tail=3)
