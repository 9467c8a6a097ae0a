"""Test/inference orchestration (reference Test loop, loops.py:165-236, and the
``bin-dl/*_test_*`` WriteHook artifact contracts).

Artifacts per subject (written by a bounded background writer pool with a
deterministic flush — upgrade over the reference's fire-and-forget threads):
- ``<subject>_probabilities.nii.gz`` — foreground probabilities only
  (reference bin-dl/brats_test_default.py:99);
- ``<subject>_prediction.nii.gz`` — argmax labels (uint8);
- strategy extras: ``_sigma`` (predicted-class sigma,
  brats_test_aleatoric.py:95-97), ``_confidence`` (auxiliary nets);
- ``metrics.csv`` with per-subject rows;
- for folder datasets (ISIC): symlinks of the original image + gt into the
  test dir (isic_test_default.py:118-124).
"""
from __future__ import annotations

import logging
import os
import time
import typing

import jax
import numpy as np

from rcu_tpu.data import nifti
from rcu_tpu.data.loader import prefetch
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import databuild, hooks as hooks_lib, steps as steps_lib
from rcu_tpu.models import get_model
from rcu_tpu.ops import metrics as metrics_lib
from rcu_tpu.parallel import mesh as mesh_lib
from rcu_tpu.utils import ids as ids_lib
from rcu_tpu.utils import logs as logs_lib
from rcu_tpu.utils.writerpool import WriterPool


def default_test_eval_fn(subject_data: dict, info: dict) -> dict:
    prediction = np.argmax(subject_data["probabilities"], axis=-1)
    target = np.squeeze(np.asarray(info["labels"]))
    if target.ndim > prediction.ndim:
        target = target[..., 0]
    target = (target > 0.5).astype(np.uint8)
    return {"dice": float(np.asarray(metrics_lib.dice(prediction, target)))}


def default_artifact_fn(loop: "TestLoop", subject: str, subject_data: dict,
                        info: dict):
    props = info["properties"]
    probabilities = subject_data["probabilities"]
    fg = np.squeeze(probabilities[..., 1]).astype(np.float32)
    prediction = np.argmax(probabilities, axis=-1).astype(np.uint8)
    prediction = np.squeeze(prediction)
    loop.pool.submit(nifti.write, fg,
                     os.path.join(loop.run_dir, f"{subject}_probabilities.nii.gz"),
                     props)
    loop.pool.submit(nifti.write, prediction,
                     os.path.join(loop.run_dir, f"{subject}_prediction.nii.gz"),
                     props)
    for entry, postfix in (("sigma", "sigma"), ("confidence", "confidence")):
        if entry in subject_data:
            arr = np.squeeze(np.asarray(subject_data[entry])).astype(np.float32)
            loop.pool.submit(
                nifti.write, arr,
                os.path.join(loop.run_dir, f"{subject}_{postfix}.nii.gz"), props)


def symlink_subject_inputs(loop: "TestLoop", subject: str, info: dict):
    """ISIC test-dir symlinks of the raw inputs (isic_test_default.py:118-124)."""
    for cat, entries in info.get("files", {}).items():
        for entry, path in entries.items():
            if not path or not os.path.exists(path):
                continue
            link = os.path.join(loop.run_dir, os.path.basename(path))
            if not os.path.lexists(link):
                os.symlink(os.path.abspath(path), link)


class TestLoop:
    __test__ = False  # not a pytest class

    def __init__(self, config: cfg_lib.TestConfiguration,
                 predict_fn=None, model=None, entries: tuple = ("probabilities",),
                 eval_subject_fn=None, artifact_fn=None, hooks: list = None,
                 mesh=None, needs_rng: bool = False, symlink_inputs: bool = False,
                 state_override=None, external_state: bool = False,
                 run_dir_base: str = None):
        """``external_state=True`` declares that ``predict_fn`` carries its own
        parameters (e.g. a stacked-ensemble closure): no checkpoint is loaded
        and no state is threaded. ``run_dir_base`` anchors the test run dir
        when neither ``config.test_dir`` nor ``config.model_dir`` should."""
        self.config = config
        self.mesh = mesh
        self.needs_rng = needs_rng
        self.symlink_inputs = symlink_inputs
        self.entries = tuple(entries)
        self.eval_subject_fn = eval_subject_fn or default_test_eval_fn
        self.artifact_fn = artifact_fn or default_artifact_fn
        self._state_override = state_override
        self.external_state = external_state

        self.model_files = ckpt_lib.ModelFiles.from_model_dir(config.model_dir) \
            if config.model_dir else None
        if model is None:
            if external_state:
                # predict_fn carries its own parameters — no model or
                # checkpoint dir is needed, but then predict_fn is mandatory
                # (run() cannot resolve a default forward without a model)
                if predict_fn is None:
                    raise ValueError(
                        "external_state without a model requires an explicit "
                        "predict_fn")
            elif self.model_files is None:
                raise ValueError("config.model_dir or an explicit model is required")
            else:
                model_node, _ = ckpt_lib.load_model_parameters(self.model_files)
                model = get_model(model_node.type, model_node.params)
        elif (self.model_files is None and state_override is None
              and not external_state):
            # fail at construction, not as an AttributeError deep in
            # load_state after the dataset has already been built
            raise ValueError(
                "an explicit model without config.model_dir needs "
                "state_override or external_state — there is no checkpoint "
                "dir to load parameters from")
        self.model = model
        self.predict_fn = predict_fn  # resolved in run() when None

        self.test_id = ids_lib.unique_identifier()
        test_dir = config.test_dir
        if not test_dir and config.model_dir:
            # default: 'test' dir under the model's train run dir (context.py:276-284)
            test_dir = os.path.join(os.path.dirname(config.model_dir), "test")
        if not test_dir:
            test_dir = run_dir_base
        if not test_dir:
            raise ValueError("one of config.test_dir, config.model_dir or "
                             "run_dir_base must locate the test run dir")
        # ids have 1-second resolution: don't let two runs in the same second
        # share a run dir (artifacts/metrics would interleave). The dir is
        # RESERVED here with an atomic exclusive create — a bare exists()
        # check would let two same-second processes both pass and collide.
        for _ in range(5):
            candidate = os.path.join(test_dir,
                                     f"{self.test_id}_{config.test_name}")
            try:
                os.makedirs(candidate, exist_ok=False)
                break
            except FileExistsError:
                pass
            time.sleep(1.0)
            self.test_id = ids_lib.unique_identifier()
        else:
            raise RuntimeError(
                f"could not find a free test run dir under {test_dir} for "
                f"test_name={config.test_name!r} after 5 attempts — refusing "
                "to share a run dir (artifacts/metrics would interleave)")
        self.run_dir = os.path.join(test_dir, f"{self.test_id}_{config.test_name}")

        self.hook = hooks_lib.ComposeTestHook(
            hooks if hooks is not None else [
                hooks_lib.ConsoleTestLogHook(),
                hooks_lib.WriteTestMetricsCsvHook(
                    os.path.join(self.run_dir, "metrics.csv")),
            ])
        self.pool = WriterPool()
        self.test_dir = test_dir
        self.state = None
        self.test_data = None

    def load_state(self):
        if self.external_state:
            # predict_fn owns its parameters; thread an empty placeholder
            from rcu_tpu.engine.state import TrainState
            self.state = TrainState(params={}, batch_stats={}, opt_state=None,
                                    epoch=np.int32(0), best_score=np.float32(0))
            return
        if self._state_override is not None:
            self.state = self._state_override
            return
        shapes = self.test_data.loader.peek_item_shapes()  # one decoded item
        h, w = shapes["images"][:2]
        in_ch = getattr(self.model, "in_channels", 0) or shapes["images"][-1]
        input_shape = (1, h, w, in_ch)
        # inference needs only the params/BN restore template — no throwaway
        # optimizer state (engine.state.init_variables)
        from rcu_tpu.engine.state import TrainState, init_variables
        params_tpl, stats_tpl = init_variables(self.model, input_shape)
        self.state = TrainState(params=params_tpl, batch_stats=stats_tpl,
                                opt_state=None, epoch=np.int32(0),
                                best_score=np.float32(0))
        # NOT `or "best"`: epoch 0 is a valid integer selector
        at = self.config.test_at
        if at is None or at == "":
            at = "best"
        path = ckpt_lib.find_checkpoint_file(self.model_files, at)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint '{at}' in {self.model_files.weight_checkpoint_dir}")
        raw = ckpt_lib.load_checkpoint(path)
        template = {"params": self.state.params,
                    "batch_stats": self.state.batch_stats}
        from flax import serialization
        restored = serialization.from_state_dict(
            template, {"params": raw["params"], "batch_stats": raw["batch_stats"]})
        self.state = self.state.replace(params=restored["params"],
                                        batch_stats=restored["batch_stats"])
        logging.info("loaded checkpoint %s", path)

    def _make_assembler(self):
        return databuild.build_assembler(self.test_data.dataset,
                                         self.config.test_data.indexing,
                                         self.entries)

    def run(self):
        os.makedirs(self.run_dir, exist_ok=True)
        logs_lib.setup_logging(self.run_dir)
        cfg_lib.save(self.config, os.path.join(self.run_dir, "config.yaml"))

        cfg = self.config
        subjects = None
        if cfg.split:
            from rcu_tpu.data.split import load_split
            _, _, subjects = load_split(cfg.split, cfg.others.get("split_k"))
        bs = cfg.test_data.batch_size
        if self.mesh is not None:
            bs = mesh_lib.pad_batch_size_to_mesh(bs, self.mesh)
        self.test_data = databuild.build_data(
            cfg.test_data, subjects=subjects, seed=cfg.seed, batch_size=bs,
            prediction_dir=cfg.others.get("prediction_dir"))

        self.load_state()
        if self.mesh is not None and self.state is not None:
            from rcu_tpu.parallel.inference import replicate_tree
            self.state = replicate_tree(self.state, self.mesh)
        if self.predict_fn is None:
            self.predict_fn = steps_lib.make_predict_fn(self.model, mesh=self.mesh)
        self.hook.on_startup(self)

        sharding = mesh_lib.batch_sharding(self.mesh) if self.mesh is not None else None
        asm = self._make_assembler()
        dataset = self.test_data.dataset
        rng = jax.random.PRNGKey(cfg.seed)
        subject_results = []

        nb_batches = self.test_data.nb_batches
        try:
            for i, batch in enumerate(prefetch(iter(self.test_data.loader),
                                               sharding=sharding)):
                if self.needs_rng:
                    step_rng = jax.random.fold_in(rng, i)
                    outputs = self.predict_fn(self.state.params,
                                              self.state.batch_stats,
                                              batch, step_rng)
                else:
                    outputs = self.predict_fn(self.state.params,
                                              self.state.batch_stats, batch)
                # one coalesced D2H per batch (per-leaf np.asarray = 1 RTT
                # each over a remote-TPU link, CLAUDE.md)
                to_assemble, subj_idx, slice_idx, valid = jax.device_get((
                    {e: outputs[e] for e in self.entries if e in outputs},
                    batch["subject_index"], batch["slice_index"],
                    batch["valid"]))
                asm.add_batch(to_assemble, subj_idx, slice_idx, valid)
                self.hook.on_test_batch_end(self, i, nb_batches)
                self._drain_ready(asm, dataset, subject_results)

            self._drain_ready(asm, dataset, subject_results)
            leftover = asm.flush()
            if leftover:
                names = [dataset.subjects[si] for si in leftover]
                raise RuntimeError(
                    "test loop ended with partially assembled subjects (missing "
                    f"slices, no artifacts written): {names}")
        finally:
            # ALWAYS surface background artifact-write failures — a mid-loop
            # exception (or the leftover-subjects raise above) must not let a
            # truncated NIfTI pass silently (chains via __context__ if both
            # paths raise)
            self.pool.flush()
        self.hook.on_test_end(self, subject_results)
        self.hook.on_termination(self)
        return self

    def _drain_ready(self, asm, dataset, subject_results):
        for subject_index in asm.subjects_ready():
            subject_data = asm.get_assembled_subject(subject_index)
            info = databuild.direct_subject_info(dataset, subject_index)
            results = self.eval_subject_fn(subject_data, info)
            subject_results.append(results)
            self.artifact_fn(self, info["subject"], subject_data, info)
            if self.symlink_inputs:
                symlink_subject_inputs(self, info["subject"], info)
            self.hook.on_test_subject_end(self, info["subject"], subject_data,
                                          results)
