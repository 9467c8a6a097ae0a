"""Strategy runners: the 8 uncertainty strategies as train/test entry functions.

This is the functional replacement of the reference's 18 ``bin-dl`` scripts
(SURVEY §2.3): each runner wires the right step factories, entries and
artifacts into TrainLoop/TestLoop. The ``bin/`` CLI scripts are thin wrappers.

Strategy map (reference → here):
- baseline / center / cv / ensemble-member training → :func:`train_default`
- baseline(_mc) / center(_mc) / cv testing          → :func:`test_default`
  (``others.mc: T`` switches to the vmapped MC-dropout predictor,
  reference bin-dl/brats_test_default.py:46-50)
- aleatoric train/test → :func:`train_aleatoric` / :func:`test_aleatoric`
- 10-model ensemble test → :func:`test_ensemble` (stacked-params vmap,
  replacing the reference's sequential member loop)
- auxiliary feat. train/test → :func:`train_auxiliary_feat` / :func:`test_auxiliary_feat`
- auxiliary segm. train/test → :func:`train_auxiliary_segm` / :func:`test_auxiliary_segm`
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.engine.test import TestLoop
from rcu_tpu.engine.train import TrainLoop
from rcu_tpu.models import get_model, get_optimizer
from rcu_tpu.ops import metrics as metrics_lib


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _load_frozen_model(model_dir: str, test_at, provide_features: bool = False,
                       input_shape=None):
    """Load a trained model (params + batch stats) from its model dir
    (reference bin-dl/brats_train_auxiliary_feat.py:32-43)."""
    mf = ckpt_lib.ModelFiles.from_model_dir(model_dir)
    model_node, _ = ckpt_lib.load_model_parameters(mf)
    params_dict = dict(model_node.params)
    if provide_features:
        params_dict["provide_features"] = True
    model = get_model(model_node.type, params_dict)
    path = ckpt_lib.find_checkpoint_file(mf, test_at)
    if path is None:
        raise FileNotFoundError(f"no checkpoint '{test_at}' in {model_dir}")
    in_ch = params_dict.get("in_channels", 4)
    shape = input_shape or (1, 32, 32, in_ch)
    # restore template only — no throwaway optimizer (engine.state)
    from rcu_tpu.engine.state import init_variables
    params_tpl, stats_tpl = init_variables(model, shape)
    raw = ckpt_lib.load_checkpoint(path)
    from flax import serialization
    restored = serialization.from_state_dict(
        {"params": params_tpl, "batch_stats": stats_tpl},
        {"params": raw["params"], "batch_stats": raw["batch_stats"]})
    return model, restored["params"], restored["batch_stats"]


def _load_test_model(config: cfg_lib.TestConfiguration):
    mf = ckpt_lib.ModelFiles.from_model_dir(config.model_dir)
    model_node, _ = ckpt_lib.load_model_parameters(mf)
    return get_model(model_node.type, model_node.params)


def _binary_target(info: dict) -> np.ndarray:
    target = np.squeeze(np.asarray(info["labels"]))
    if target.ndim > 2 and target.shape[-1] == 2:  # [gt, baseline-pred] labels
        target = target[..., 0]
    return (target > 0.5).astype(np.uint8)


# ---------------------------------------------------------------------------
# per-dataset validation metrics (which checkpoint becomes "best" depends on
# these, so each matches its reference train script exactly)
# ---------------------------------------------------------------------------

def isic_eval_subject_fn(subject_data: dict, info: dict):
    """ISIC validation: SmoothDice('dice') of the argmax + Nll on the
    probabilities (reference bin-dl/isic_train_default.py:57-74)."""
    probabilities = subject_data["probabilities"]
    prediction = np.argmax(probabilities, axis=-1)
    target = _binary_target(info)
    sdice = float(np.asarray(metrics_lib.smooth_dice(prediction, target)))
    nll = float(np.asarray(metrics_lib.nll(probabilities, target)))
    return {"dice": sdice, "nll": nll}, sdice


def dice_eval_subject_fn(subject_data: dict, info: dict):
    """Dice-only validation (reference stock EvalSubjectStep, steps.py:117-132;
    used by bin-dl/brats_train_aleatoric.py:43)."""
    prediction = np.argmax(subject_data["probabilities"], axis=-1)
    dice = float(np.asarray(metrics_lib.dice(prediction, _binary_target(info))))
    return {"dice": dice}, dice


def isic_smooth_dice_eval_subject_fn(subject_data: dict, info: dict):
    """SmoothDice-only validation (reference bin-dl/isic_train_aleatoric.py:103)."""
    prediction = np.argmax(subject_data["probabilities"], axis=-1)
    sdice = float(np.asarray(metrics_lib.smooth_dice(prediction,
                                                     _binary_target(info))))
    return {"dice": sdice}, sdice


# ---------------------------------------------------------------------------
# default (baseline / center / cv / ensemble members)
# ---------------------------------------------------------------------------

def train_default(config: cfg_lib.TrainConfiguration, mesh=None,
                  eval_subject_fn=None) -> TrainLoop:
    return TrainLoop(config, mesh=mesh, eval_subject_fn=eval_subject_fn).run()


def test_default(config: cfg_lib.TestConfiguration, mesh=None,
                 symlink_inputs: bool = False) -> TestLoop:
    mc = int(config.others.get("mc") or 0)
    if mc:
        model = _load_test_model(config)
        predict = steps_lib.make_mc_predict_fn(model, mc, mesh=mesh)
        return TestLoop(config, predict_fn=predict, model=model,
                        entries=("probabilities",), needs_rng=True, mesh=mesh,
                        symlink_inputs=symlink_inputs).run()
    return TestLoop(config, mesh=mesh, symlink_inputs=symlink_inputs).run()


# ---------------------------------------------------------------------------
# aleatoric
# ---------------------------------------------------------------------------

def _require_log_sigma(config) -> bool:
    return cfg_lib.require_log_sigma(config)


def train_aleatoric(config: cfg_lib.TrainConfiguration, mesh=None,
                    eval_subject_fn=None) -> TrainLoop:
    is_log_sigma = _require_log_sigma(config)
    model = get_model(config.model.type, config.model.params)
    optimizer = get_optimizer(config.optimizer.type, config.optimizer.params)
    train_step = steps_lib.make_train_step(model, optimizer,
                                           loss_kind="aleatoric",
                                           is_log_sigma=is_log_sigma,
                                           mesh=mesh)
    # reference validates aleatoric runs with dice only (brats_train_aleatoric
    # .py:43 uses the stock EvalSubjectStep)
    return TrainLoop(config, model=model, optimizer=optimizer,
                     train_step=train_step, mesh=mesh,
                     eval_subject_fn=eval_subject_fn or dice_eval_subject_fn).run()


def test_aleatoric(config: cfg_lib.TestConfiguration, mesh=None,
                   symlink_inputs: bool = False) -> TestLoop:
    is_log_sigma = _require_log_sigma(config)
    model = _load_test_model(config)
    predict = steps_lib.make_aleatoric_predict_fn(model, is_log_sigma, mesh=mesh)
    return TestLoop(config, predict_fn=predict, model=model,
                    entries=("probabilities", "sigma"), mesh=mesh,
                    symlink_inputs=symlink_inputs).run()


# ---------------------------------------------------------------------------
# ensemble
# ---------------------------------------------------------------------------

def test_ensemble(config: cfg_lib.TestConfiguration, mesh=None,
                  symlink_inputs: bool = False) -> TestLoop:
    """Primary model (config.model_dir) + others.model_dir members, stacked on
    a leading axis and vmapped (reference brats_test_ensemble.py:40-94)."""
    model_dirs = config.others.get("model_dir")
    if isinstance(model_dirs, str):
        model_dirs = [model_dirs]
    if not model_dirs or "test_at" not in config.others:
        # an empty member list (the generated configs ship model_dir: [] as a
        # fill-me-in placeholder) must fail with this message, not a tree_map
        # crash further down
        raise ValueError('missing "model_dir" or "test_at" entry in the '
                         'configuration (others): fill others.model_dir with '
                         'the trained member model dirs')
    # the primary model loads at config.test_at; additional members at
    # others.test_at (reference loops.py:188 vs brats_test_ensemble.py:44-50)
    primary_at = "best" if config.test_at in (None, "") else config.test_at
    member_at = config.others["test_at"]
    all_dirs = ([(config.model_dir, primary_at)] if config.model_dir else []) \
        + [(d, member_at) for d in model_dirs]

    members, model = [], None
    for i, (model_dir, at) in enumerate(all_dirs):
        logging.info("load ensemble model [%d/%d] %s", i + 1, len(all_dirs),
                     os.path.basename(model_dir))
        model, params, batch_stats = _load_frozen_model(model_dir, at)
        members.append((params, batch_stats))
    stack = lambda *xs: np.stack([np.asarray(x) for x in xs])  # noqa: E731
    stacked_params = jax.tree_util.tree_map(stack, *[m[0] for m in members])
    stacked_stats = jax.tree_util.tree_map(stack, *[m[1] for m in members])

    from rcu_tpu.parallel import ensemble as ens_lib
    if mesh is not None and ens_lib.MODEL_AXIS in mesh.axis_names:
        # 2-D model x data mesh: members sharded over 'model' (EP), batches
        # over 'data' (DP) — one program across all chips
        ensemble_predict = ens_lib.shard_ensemble_predict_fn(model, mesh)
    else:
        ensemble_predict = steps_lib.make_ensemble_predict_fn(model, mesh=mesh)

    def predict(params, batch_stats, batch):
        return ensemble_predict(stacked_params, stacked_stats, batch)

    # anchor the test run dir under the first member's train dir when the
    # config names no primary model (reference default, context.py:276-284)
    anchor = config.model_dir or all_dirs[0][0]
    return TestLoop(config, predict_fn=predict, model=model,
                    entries=("probabilities", "entropy"),
                    external_state=True, mesh=mesh,
                    run_dir_base=os.path.join(os.path.dirname(anchor), "test"),
                    symlink_inputs=symlink_inputs).run()


# ---------------------------------------------------------------------------
# auxiliary feat.
# ---------------------------------------------------------------------------

def _aux_feat_eval_subject_fn(subject_data: dict, info: dict):
    """Dice of the PostNet's error prediction vs the actual error mask
    (reference brats_train_auxiliary_feat.py EvalSubjectStep)."""
    probabilities = subject_data["probabilities"]
    net_predictions = np.squeeze(subject_data["net_predictions"])
    target = (net_predictions.astype(np.uint8) != _binary_target(info))
    prediction = np.argmax(probabilities, axis=-1)
    dice = float(np.asarray(metrics_lib.dice(prediction, target)))
    ce = float(np.asarray(metrics_lib.log_loss(
        probabilities.reshape(-1, probabilities.shape[-1]),
        target.astype(np.uint8))))
    return {"dice": dice, "ce": ce}, dice


def _aux_feat_test_eval_fn(subject_data: dict, info: dict) -> dict:
    """Test metrics = dice of the FROZEN segmenter
    (brats_test_auxiliary_feat.py:89-97)."""
    prediction = np.argmax(subject_data["segm_probabilities"], axis=-1)
    return {"dice": float(np.asarray(metrics_lib.dice(
        prediction, _binary_target(info))))}


def _aux_feat_artifact_fn(loop: TestLoop, subject: str, subject_data: dict,
                          info: dict):
    """_confidence (PostNet fg) + _prediction (frozen segm argmax)
    (brats_test_auxiliary_feat.py:116-129)."""
    from rcu_tpu.data import nifti
    props = info["properties"]
    confidence = np.squeeze(subject_data["probabilities"][..., 1]).astype(np.float32)
    prediction = np.squeeze(
        np.argmax(subject_data["segm_probabilities"], axis=-1)).astype(np.uint8)
    loop.pool.submit(nifti.write, confidence,
                     os.path.join(loop.run_dir, f"{subject}_confidence.nii.gz"), props)
    loop.pool.submit(nifti.write, prediction,
                     os.path.join(loop.run_dir, f"{subject}_prediction.nii.gz"), props)


def _frozen_segm_from_others(others: dict):
    if "model_dir" not in others or "test_at" not in others:
        raise ValueError('missing "model_dir" or "test_at" entry in the '
                         'configuration (others)')
    return _load_frozen_model(others["model_dir"], others["test_at"],
                              provide_features=True)


def train_auxiliary_feat(config: cfg_lib.TrainConfiguration, mesh=None) -> TrainLoop:
    segm_model, segm_params, segm_stats = _frozen_segm_from_others(config.others)
    post_model = get_model(config.model.type, config.model.params)
    optimizer = get_optimizer(config.optimizer.type, config.optimizer.params)
    train_step = steps_lib.make_auxiliary_train_step(post_model, optimizer,
                                                     segm_model=segm_model,
                                                     mesh=mesh)
    aux_predict = steps_lib.make_auxiliary_feat_predict_fn(segm_model, post_model, mesh=mesh)

    def predict(params, batch_stats, batch):
        return aux_predict(segm_params, segm_stats, params, batch_stats, batch)

    return TrainLoop(config, model=post_model, optimizer=optimizer,
                     train_step=train_step, predict_fn=predict,
                     eval_subject_fn=_aux_feat_eval_subject_fn,
                     extra_step_args=((segm_params, segm_stats),),
                     validation_entries=("probabilities", "net_predictions"),
                     mesh=mesh).run()


def test_auxiliary_feat(config: cfg_lib.TestConfiguration, mesh=None,
                        symlink_inputs: bool = False) -> TestLoop:
    segm_model, segm_params, segm_stats = _frozen_segm_from_others(config.others)
    post_model = _load_test_model(config)
    aux_predict = steps_lib.make_auxiliary_feat_predict_fn(segm_model, post_model, mesh=mesh)

    def predict(params, batch_stats, batch):
        return aux_predict(segm_params, segm_stats, params, batch_stats, batch)

    return TestLoop(config, predict_fn=predict, model=post_model,
                    entries=("probabilities", "segm_probabilities"),
                    eval_subject_fn=_aux_feat_test_eval_fn,
                    artifact_fn=_aux_feat_artifact_fn, mesh=mesh,
                    symlink_inputs=symlink_inputs).run()


# ---------------------------------------------------------------------------
# auxiliary segm.
# ---------------------------------------------------------------------------

def _aux_segm_eval_subject_fn(subject_data: dict, info: dict):
    """Dice + ce of the error-net prediction vs (baseline_pred != gt)
    (reference brats_train_auxiliary_segm.py:106 — DiceNumpy + LogLossSklearn)."""
    probabilities = subject_data["probabilities"]
    labels = np.squeeze(np.asarray(info["labels"]))
    gt = (labels[..., 0] > 0.5).astype(np.uint8)
    baseline = (labels[..., 1] > 0.5).astype(np.uint8)
    target = baseline != gt
    prediction = np.argmax(probabilities, axis=-1)
    dice = float(np.asarray(metrics_lib.dice(prediction, target)))
    ce = float(np.asarray(metrics_lib.log_loss(
        probabilities.reshape(-1, probabilities.shape[-1]),
        target.astype(np.uint8))))
    return {"dice": dice, "ce": ce}, dice


def _aux_segm_artifact_fn(loop: TestLoop, subject: str, subject_data: dict,
                          info: dict):
    """_confidence (error-net fg) + passthrough _prediction (the baseline's,
    reference brats_test_auxiliary_segm.py:68-69,109-120)."""
    from rcu_tpu.data import nifti
    props = info["properties"]
    confidence = np.squeeze(subject_data["probabilities"][..., 1]).astype(np.float32)
    labels = np.squeeze(np.asarray(info["labels"]))
    baseline = (labels[..., 1] > 0.5).astype(np.uint8)
    loop.pool.submit(nifti.write, confidence,
                     os.path.join(loop.run_dir, f"{subject}_confidence.nii.gz"), props)
    loop.pool.submit(nifti.write, baseline,
                     os.path.join(loop.run_dir, f"{subject}_prediction.nii.gz"), props)


def train_auxiliary_segm(config: cfg_lib.TrainConfiguration, mesh=None) -> TrainLoop:
    model = get_model(config.model.type, config.model.params)
    optimizer = get_optimizer(config.optimizer.type, config.optimizer.params)
    train_step = steps_lib.make_auxiliary_train_step(model, optimizer,
                                                     segm_model=None,
                                                     mesh=mesh)
    predict = steps_lib.make_auxiliary_segm_predict_fn(model, mesh=mesh)
    return TrainLoop(config, model=model, optimizer=optimizer,
                     train_step=train_step, predict_fn=predict,
                     eval_subject_fn=_aux_segm_eval_subject_fn,
                     extra_step_args=(None,), mesh=mesh).run()


def test_auxiliary_segm(config: cfg_lib.TestConfiguration, mesh=None,
                        symlink_inputs: bool = False) -> TestLoop:
    model = _load_test_model(config)
    predict = steps_lib.make_auxiliary_segm_predict_fn(model, mesh=mesh)
    return TestLoop(config, predict_fn=predict, model=model,
                    entries=("probabilities",),
                    eval_subject_fn=lambda sd, info:
                        _aux_segm_eval_subject_fn(sd, info)[0],
                    artifact_fn=_aux_segm_artifact_fn, mesh=mesh,
                    symlink_inputs=symlink_inputs).run()


TRAIN_STRATEGIES = {
    "default": train_default,
    "aleatoric": train_aleatoric,
    "auxiliary_feat": train_auxiliary_feat,
    "auxiliary_segm": train_auxiliary_segm,
}

TEST_STRATEGIES = {
    "default": test_default,
    "aleatoric": test_aleatoric,
    "ensemble": test_ensemble,
    "auxiliary_feat": test_auxiliary_feat,
    "auxiliary_segm": test_auxiliary_segm,
}
