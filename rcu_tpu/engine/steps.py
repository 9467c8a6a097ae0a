"""Functional step factories — the TPU-native replacement of the reference's
step/hook OO machinery (common/trainloop/steps.py, rechun/dl/customsteps.py).

Each factory closes over a flax model (+ optimizer) and returns a jitted pure
function. Batches are dicts with static shapes and a ``valid`` mask (padded
ragged tails); losses and scores are valid-weighted so padding contributes
nothing.

MC-dropout (reference McPredictStep's T sequential forwards,
customsteps.py:27-39) is a single ``vmap`` over T PRNG keys — one XLA program,
T-way batched convolutions on the MXU. Ensembles (reference sequential member
loop, bin-dl/brats_test_ensemble.py:84-94) vmap over stacked member params.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rcu_tpu.engine.state import TrainState
from rcu_tpu.ops import losses as losses_lib
from rcu_tpu.ops import metrics as metrics_lib


def _jit_predict(fn, mesh=None, n_leading_rep: int = 2, has_rng: bool = False):
    """jit a predict fn; with a mesh, pin the canonical inference shardings:
    parameter trees replicated, the batch dict sharded on its leading axis
    over the mesh's data axis, outputs batch-sharded. Without a mesh this is
    plain ``jax.jit`` (single-device path, bit-identical results)."""
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    in_shardings = (rep,) * n_leading_rep + (data,) + ((rep,) if has_rng else ())
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=data)


def _jit_train_step(fn, mesh=None, donate: bool = True, n_extra_rep: int = 0):
    """jit a (state, [extra...], batch, rng) -> (state, metrics) step. With a
    mesh: state/extras/rng replicated, batch data-sharded, outputs replicated
    — XLA emits the gradient psum over ICI."""
    donate_args = (0,) if donate else ()
    if mesh is None:
        return jax.jit(fn, donate_argnums=donate_args)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rcu_tpu.parallel.mesh import DATA_AXIS
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    in_shardings = (rep,) + (rep,) * n_extra_rep + (data, rep)
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=(rep, rep),
                   donate_argnums=donate_args)


def _masked_mean(per_px: jnp.ndarray, valid: jnp.ndarray):
    """Mean over pixels of valid batch items; per_px (B, H, W), valid (B,)."""
    w = valid[:, None, None]
    return jnp.sum(per_px * w) / (jnp.sum(valid) * per_px.shape[1] * per_px.shape[2])


def _masked_ce(logits, labels, valid):
    return -_masked_mean(losses_lib.ce_log_probs(logits, labels), valid)


def _batch_smooth_dice(logits, labels, valid):
    """Valid-masked smooth dice of softmax probabilities vs one-hot labels —
    the reference EvalStep train score (steps.py:45-66)."""
    probs = jax.nn.softmax(logits, axis=-1)
    nb_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, nb_classes, dtype=probs.dtype)
    w = valid[:, None, None, None]
    iflat = (probs * w).reshape(-1)
    tflat = (onehot * w).reshape(-1)
    intersection = jnp.sum(iflat * tflat)
    return (2.0 * intersection + 1.0) / (jnp.sum(iflat) + jnp.sum(tflat) + 1.0)


def make_train_step(model, optimizer, loss_kind: str = "ce",
                    is_log_sigma: bool = False, nb_samples: int = 10,
                    donate: bool = True, mesh=None, remat: str = None):
    """CE (reference TrainStep, steps.py:20-42) or aleatoric
    (bin-dl/brats_train_aleatoric.py:52-74) training step. With ``mesh`` the
    step jits with replicated state and data-sharded batches.

    ``remat`` picks the rematerialization policy for the backward pass —
    both variants are MEASURED NEGATIVES on the HBM-bound BraTS step, kept
    selectable for other shapes (numbers: scripts/perf_analysis.py):
    - ``None`` (default): store activations — the fastest measured config;
    - ``'conv'``: policy remat via ``jax.checkpoint`` saving only the
      tagged conv outputs (models/unet.py ``checkpoint_name``) and
      recomputing the fused dropout/BN/relu epilogues;
    - ``'full'``: recompute the whole forward."""

    def fwd(params, batch_stats, images, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})

    if remat == "full":
        fwd = jax.checkpoint(fwd)
    elif remat == "conv":
        fwd = jax.checkpoint(
            fwd,
            policy=jax.checkpoint_policies.save_only_these_names("conv_out"))
    elif remat is not None:
        raise ValueError(f"unknown remat policy '{remat}'; "
                         "choose None, 'conv' or 'full'")
    if loss_kind not in ("ce", "aleatoric"):
        # a typo'd kind would silently train plain CE with the sigma head
        # ignored and the run would look healthy
        raise ValueError(f"unknown loss_kind '{loss_kind}'; "
                         "choose 'ce' or 'aleatoric'")

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = fwd(params, batch_stats, batch["images"], rng)
        labels = batch["labels"].astype(jnp.int32)
        valid = batch["valid"]
        if loss_kind == "aleatoric":
            noise_rng = jax.random.fold_in(rng, 1)
            picked = losses_lib.aleatoric_log_probs(
                noise_rng, out.logits, out.sigma, labels, is_log_sigma,
                nb_samples)
            loss = -_masked_mean(picked, valid)
        else:
            loss = _masked_ce(out.logits, labels, valid)
        score = _batch_smooth_dice(out.logits, labels, valid)
        return loss, (mutated["batch_stats"], score)

    def train_step(state: TrainState, batch: dict, rng) -> tuple:
        (loss, (new_stats, score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, {"loss": loss, "dice": score}

    return _jit_train_step(train_step, mesh, donate)


def make_predict_fn(model, mesh=None):
    """Deterministic softmax forward (reference SegmentationPredictStep).
    With ``mesh``, the batch shards over the data axis (params replicated)."""

    def predict(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["images"], train=False)
        return {"probabilities": jax.nn.softmax(out.logits, axis=-1)}

    return _jit_predict(predict, mesh)


def multi_prediction_summary(multi_probabilities: jnp.ndarray,
                             do_mi: bool = False, do_var: bool = False) -> dict:
    """Mean probs / predictive entropy (/ MI / mean class variance) over the
    leading sample axis (reference MultiPredictionSummary, customsteps.py:42-71)."""
    probabilities = jnp.mean(multi_probabilities, axis=0)
    out = {"probabilities": probabilities,
           "entropy": metrics_lib.entropy(probabilities, axis=-1)}
    if do_mi:
        expected_entropy = jnp.mean(
            metrics_lib.entropy(multi_probabilities, axis=-1), axis=0)
        out["mutual_info"] = out["entropy"] - expected_entropy
    if do_var:
        out["variance"] = jnp.mean(jnp.var(multi_probabilities, axis=0), axis=-1)
    return out


def mc_forward(model, variables, images, rng, mc_steps: int):
    """The T stochastic forwards of the MC protocol as one vmapped program.

    When the model exposes an MC-deterministic encoder prefix
    (``UNet.mc_shared_blocks`` > 0, i.e. ``dropout_center < depth`` models),
    that prefix runs ONCE and only the stochastic tail fans out over the T
    samples — identical outputs (the flax rng folding is path-based and the
    split reuses the same modules), up to ~1.5x fewer conv FLOPs at T=20.
    Note the paper's shipped center config sets ``dropout_center == depth``
    (dropout on every level), whose prefix is empty — the fast path then
    falls through to the plain T-way vmap at zero cost.
    Returns (T, ...) stacked class probabilities."""
    shared = getattr(model, "mc_shared_blocks", 0)
    keys = jax.random.split(rng, mc_steps)
    if shared:
        h, skips = model.apply(variables, images, train=False,
                               method=type(model).encode_shared)

        def one_tail(key):
            out = model.apply(variables, h, skips, train=False,
                              mc_dropout=True, rngs={"dropout": key},
                              method=type(model).decode_rest)
            return jax.nn.softmax(out.logits, axis=-1)

        return jax.vmap(one_tail)(keys)

    def one(key):
        out = model.apply(variables, images, train=False, mc_dropout=True,
                          rngs={"dropout": key})
        return jax.nn.softmax(out.logits, axis=-1)

    return jax.vmap(one)(keys)


def make_mc_predict_fn(model, mc_steps: int, do_mi: bool = False,
                       do_var: bool = False, mesh=None):
    """T stochastic forwards as one vmapped program + weight-scaling forward
    (reference McPredictStep, customsteps.py:10-39). With ``mesh``, each chip
    runs all T forwards on its shard of the batch (data parallelism over ICI;
    the flagship multi-chip inference path)."""

    def predict(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        images = batch["images"]
        ws_out = model.apply(variables, images, train=False)
        ws_probabilities = jax.nn.softmax(ws_out.logits, axis=-1)

        mc_probs = mc_forward(model, variables, images, rng, mc_steps)
        out = multi_prediction_summary(mc_probs, do_mi, do_var)
        out["ws_probabilities"] = ws_probabilities
        return out

    return _jit_predict(predict, mesh, has_rng=True)


def aleatoric_forward(model, variables, images, is_log_sigma: bool):
    """ONE deterministic aleatoric forward -> (probabilities, sigma_all,
    prediction, predicted_sigma). The single home of the sigma-protocol math
    (reference bin-dl/brats_test_aleatoric.py:66-97: exp() when log-sigma,
    abs() otherwise; the artifact stores the predicted class's sigma) —
    shared by the staged predict step and the direct fused pipeline."""
    out = model.apply(variables, images, train=False)
    probabilities = jax.nn.softmax(out.logits, axis=-1)
    sigma = jnp.exp(out.sigma) if is_log_sigma else jnp.abs(out.sigma)
    prediction = jnp.argmax(probabilities, axis=-1)
    predicted_sigma = jnp.take_along_axis(
        sigma, prediction[..., None], axis=-1)[..., 0]
    return probabilities, sigma, prediction, predicted_sigma


def make_aleatoric_predict_fn(model, is_log_sigma: bool, mesh=None):
    """Softmax probs + per-class sigma + predicted-class sigma."""

    def predict(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        probabilities, sigma, _, predicted_sigma = aleatoric_forward(
            model, variables, batch["images"], is_log_sigma)
        return {"probabilities": probabilities, "sigma_all": sigma,
                "sigma": predicted_sigma}

    return _jit_predict(predict, mesh)


def make_ensemble_predict_fn(model, do_mi: bool = False, do_var: bool = False,
                             mesh=None):
    """Stacked-parameter ensemble inference: members vmapped in one program
    (replaces the reference's sequential member loop,
    bin-dl/brats_test_ensemble.py:72-94)."""

    def predict(stacked_params, stacked_batch_stats, batch):
        images = batch["images"]

        def one(params, batch_stats):
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              images, train=False)
            return jax.nn.softmax(out.logits, axis=-1)

        member_probs = jax.vmap(one)(stacked_params, stacked_batch_stats)
        return multi_prediction_summary(member_probs, do_mi, do_var)

    return _jit_predict(predict, mesh)


def make_auxiliary_feat_predict_fn(segm_model, post_model, mesh=None):
    """Frozen segmenter (provide_features) + PostNet error/confidence net
    (reference bin-dl/brats_{train,test}_auxiliary_feat.py).

    Output entries mirror the reference scripts:
    - 'probabilities':      PostNet softmax (2-ch) — the confidence output
    - 'net_predictions':    frozen segmenter argmax
    - 'segm_probabilities': frozen segmenter softmax (2-ch)
    - 'confidence':         PostNet foreground column (artifact payload)
    """

    def predict(segm_params, segm_stats, post_params, post_stats, batch):
        segm_out = segm_model.apply(
            {"params": segm_params, "batch_stats": segm_stats}, batch["images"],
            train=False)
        segm_probabilities = jax.nn.softmax(segm_out.logits, axis=-1)
        post_out = post_model.apply(
            {"params": post_params, "batch_stats": post_stats},
            segm_out.features, train=False)
        confidence = jax.nn.softmax(post_out.logits, axis=-1)
        return {"probabilities": confidence,
                "net_predictions": jnp.argmax(segm_probabilities, axis=-1),
                "segm_probabilities": segm_probabilities,
                "confidence": confidence[..., 1]}

    return _jit_predict(predict, mesh, n_leading_rep=4)


def make_auxiliary_segm_predict_fn(model, mesh=None):
    """Auxiliary-segm forward: input = images concat baseline-prediction channel
    (labels carry [gt, prediction]; reference brats_test_auxiliary_segm.py)."""

    def predict(params, batch_stats, batch):
        images, labels = batch["images"], batch["labels"]
        pred_channel = labels[..., 1].astype(jnp.float32)
        inputs = jnp.concatenate([images, pred_channel[..., None]], axis=-1)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          inputs, train=False)
        confidence = jax.nn.softmax(out.logits, axis=-1)
        return {"probabilities": confidence,
                "confidence": confidence[..., 1],
                "baseline_prediction": labels[..., 1]}

    return _jit_predict(predict, mesh)


def make_auxiliary_train_step(post_model, optimizer, segm_model=None,
                              donate: bool = True, mesh=None):
    """Train a confidence net to predict the segmenter's error mask
    (reference bin-dl/brats_train_auxiliary_feat.py:67-95 /
    brats_train_auxiliary_segm.py:65-72).

    With ``segm_model`` the input runs through the frozen segmenter and the
    PostNet sees its features; the target is ``(net_prediction != gt)``.
    Without it (auxiliary-segm), the batch's images already carry the baseline
    prediction as an extra channel and labels carry [gt, prediction]."""

    def loss_fn(params, batch_stats, frozen, batch, rng):
        valid = batch["valid"]
        if segm_model is not None:
            segm_params, segm_stats = frozen
            segm_out = segm_model.apply(
                {"params": segm_params, "batch_stats": segm_stats},
                batch["images"], train=False)
            net_prediction = jnp.argmax(segm_out.logits, axis=-1)
            target = (net_prediction != batch["labels"].astype(jnp.int32)
                      ).astype(jnp.int32)
            inputs = segm_out.features
        else:
            # auxiliary-segm: labels carry [gt, baseline-prediction]; the model
            # input is images with the prediction appended as a channel
            # (reference brats_train_auxiliary_segm.py:65-72)
            gt = batch["labels"][..., 0].astype(jnp.int32)
            baseline_pred = batch["labels"][..., 1].astype(jnp.int32)
            target = (baseline_pred != gt).astype(jnp.int32)
            inputs = jnp.concatenate(
                [batch["images"], baseline_pred[..., None].astype(jnp.float32)],
                axis=-1)
        out, mutated = post_model.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs, train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        loss = _masked_ce(out.logits, target, valid)
        score = _batch_smooth_dice(out.logits, target, valid)
        return loss, (mutated["batch_stats"], score)

    def train_step(state: TrainState, frozen, batch: dict, rng):
        (loss, (new_stats, score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, frozen,
                                   batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, {"loss": loss, "dice": score}

    return _jit_train_step(train_step, mesh, donate, n_extra_rep=1)
