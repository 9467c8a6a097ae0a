"""Training orchestration — functional replacement of the reference Train /
ValidateSubject loops (common/trainloop/loops.py:12-162).

Host python only orchestrates: the hot path is one jitted ``train_step``
(donated state, optionally sharded over a device mesh) consuming prefetched
static-shape batches; validation is a jitted predict over the valid loader
with slice->volume assembly and per-subject metrics.

Run-dir layout, resume-by-id, per-epoch reseeding, best-score tracking and
checkpoint retention keep the reference's exact contracts:
- run dir ``<train_dir>/<run_id>_<train_name>`` (resume when train_name starts
  with a run id, context.py:117-134);
- config copy + log.txt inside the run dir (context.py:136-150);
- model.json + ``checkpoints/checkpoint_ep###[-best].ckpt`` retention
  (management.py, hooks.py:297-328).
"""
from __future__ import annotations

import logging
import os
import time
import typing

import jax
import numpy as np

from rcu_tpu.data.loader import prefetch
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import databuild, hooks as hooks_lib, steps as steps_lib
from rcu_tpu.engine.state import TrainState, create_train_state
from rcu_tpu.models import get_model, get_optimizer
from rcu_tpu.ops import metrics as metrics_lib
from rcu_tpu.parallel import mesh as mesh_lib
from rcu_tpu.utils import ids as ids_lib
from rcu_tpu.utils import logs as logs_lib


def default_eval_subject_fn(subject_data: dict, info: dict) -> typing.Tuple[dict, float]:
    """Per-subject validation metrics: dice of argmax + log loss as ``ce``
    (reference bin-dl/brats_train_default.py:58-73 — DiceNumpy +
    LogLossSklearn(result_entry='ce')). Returns (results, score)."""
    probabilities = subject_data["probabilities"]
    prediction = np.argmax(probabilities, axis=-1)
    target = np.squeeze(np.asarray(info["labels"]))
    if target.ndim > prediction.ndim:  # multi-channel labels: gt is channel 0
        target = target[..., 0]
    target = (target > 0.5).astype(np.uint8)
    dice = float(np.asarray(metrics_lib.dice(prediction, target)))
    ce = float(np.asarray(metrics_lib.log_loss(
        probabilities.reshape(-1, probabilities.shape[-1]), target)))
    return {"dice": dice, "ce": ce}, dice


class TrainLoop:
    """One training run. Strategy scripts override train_step/predict_fn."""

    def __init__(self, config: cfg_lib.TrainConfiguration,
                 train_step=None, predict_fn=None, eval_subject_fn=None,
                 hooks: list = None, mesh=None,
                 model=None, optimizer=None, extra_step_args: tuple = (),
                 validation_entries: tuple = ("probabilities",)):
        self.config = config
        self.mesh = mesh
        self.extra_step_args = extra_step_args
        self.validation_entries = tuple(validation_entries)

        # model + optimizer from config registries unless injected
        if model is None:
            if config.model is None:
                raise ValueError("config.model is required")
            model = get_model(config.model.type, config.model.params)
        if optimizer is None:
            if config.optimizer is None:
                raise ValueError("config.optimizer is required")
            optimizer = get_optimizer(config.optimizer.type, config.optimizer.params)
        self.model = model
        self.optimizer = optimizer

        # with a mesh the factory jits with replicated-state / data-sharded-
        # batch shardings; strategy-injected steps are built mesh-aware by
        # their own factories (strategies.py passes mesh through)
        self.train_step = train_step if train_step is not None else \
            steps_lib.make_train_step(model, optimizer, mesh=mesh)
        self.predict_fn = predict_fn if predict_fn is not None else \
            steps_lib.make_predict_fn(model, mesh=mesh)
        self.eval_subject_fn = eval_subject_fn or default_eval_subject_fn

        # run identity + resume (reference context.py:117-134)
        leading = ids_lib.extract_leading_identifier(config.train_name)
        self.resume = bool(leading)
        self.run_id = leading or ids_lib.unique_identifier()
        if not self.resume:
            # ids have 1-second resolution: two fresh runs in the same second
            # must not silently share one run dir (checkpoints/CSVs would
            # interleave). Reserve with an atomic exclusive create — a bare
            # exists() check would let two same-second processes both pass.
            for _ in range(5):
                try:
                    os.makedirs(os.path.join(
                        config.train_dir, f"{self.run_id}_{config.train_name}"),
                        exist_ok=False)
                    break
                except FileExistsError:
                    pass
                time.sleep(1.0)
                self.run_id = ids_lib.unique_identifier()
            else:
                raise RuntimeError(
                    f"could not find a free train run dir under "
                    f"{config.train_dir} for train_name="
                    f"{config.train_name!r} after 5 attempts — refusing to "
                    "share a run dir (checkpoints/CSVs would interleave)")
        run_name = config.train_name if self.resume \
            else f"{self.run_id}_{config.train_name}"
        self.run_dir = os.path.join(config.train_dir, run_name)
        self.model_files = ckpt_lib.ModelFiles.create(self.run_dir, self.run_id)

        default_hooks = [
            hooks_lib.ConsoleLogHook(config.log_every_nth),
            hooks_lib.TensorboardHook(os.path.join(self.run_dir, "tb")),
            hooks_lib.SaveBestModelHook(),
            hooks_lib.SaveNLastModelHook(3),
            hooks_lib.WriteValidationMetricsCsvHook(
                os.path.join(self.run_dir, "validation_metrics.csv")),
        ] if hooks is None else hooks
        self.hook = hooks_lib.ComposeTrainHook(default_hooks)

        self.state: TrainState = None
        self.train_data = None
        self.valid_data = None
        self.nb_params = None
        self.best_score = None

    # -- lifecycle pieces ------------------------------------------------
    def setup_directory(self):
        os.makedirs(self.run_dir, exist_ok=True)
        cfg_lib.save(self.config, os.path.join(self.run_dir, "config.yaml"))

    def load_data(self):
        cfg = self.config
        train_subjects = valid_subjects = None
        if cfg.split:
            from rcu_tpu.data.split import load_split
            k = cfg.others.get("split_k")
            train_subjects, valid_subjects, _ = load_split(cfg.split, k)
        bs_train = cfg.train_data.batch_size
        bs_valid = cfg.valid_data.batch_size
        if self.mesh is not None:
            bs_train = mesh_lib.pad_batch_size_to_mesh(bs_train, self.mesh)
            bs_valid = mesh_lib.pad_batch_size_to_mesh(bs_valid, self.mesh)
        prediction_dir = cfg.others.get("prediction_dir")
        self.train_data = databuild.build_data(
            cfg.train_data, subjects=train_subjects, seed=cfg.seed,
            batch_size=bs_train, prediction_dir=prediction_dir)
        self.valid_data = databuild.build_data(
            cfg.valid_data, subjects=valid_subjects, seed=cfg.seed,
            batch_size=bs_valid, prediction_dir=prediction_dir)

    def init_state(self):
        shapes = self.train_data.loader.peek_item_shapes()  # one decoded item
        h, w = shapes["images"][:2]
        # model input channels may differ from the data channels (PostNet sees
        # features; auxiliary-segm appends the baseline prediction channel)
        in_ch = getattr(self.model, "in_channels", 0) or shapes["images"][-1]
        input_shape = (1, h, w, in_ch)
        rng = jax.random.PRNGKey(self.config.seed)
        self.state = create_train_state(self.model, self.optimizer, input_shape, rng)
        self.nb_params = sum(np.prod(x.shape) for x in
                             jax.tree_util.tree_leaves(self.state.params))
        ckpt_lib.backup_model_parameters(self.model_files, self.config.model,
                                         self.config.optimizer)

    def save_checkpoint(self, epoch: int, best: bool = False):
        payload = {
            "params": self.state.params, "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state, "epoch": epoch,
            "best_score": np.float32(self.best_score
                                     if self.best_score is not None else -np.inf),
        }
        ckpt_lib.save_checkpoint(self.model_files, payload, epoch, best)

    def load_checkpoint(self, at) -> int:
        path = ckpt_lib.find_checkpoint_file(self.model_files, at)
        if path is None:
            raise FileNotFoundError(f"no checkpoint '{at}' in "
                                    f"{self.model_files.weight_checkpoint_dir}")
        template = {
            "params": self.state.params, "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state, "epoch": 0,
            "best_score": np.float32(0),
        }
        restored = ckpt_lib.load_checkpoint(path, template)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"])
        best = float(restored["best_score"])
        self.best_score = None if not np.isfinite(best) else best
        return int(restored["epoch"])

    # -- main ------------------------------------------------------------
    def run(self):
        resume_at = None
        if self.resume:
            resume_at = ckpt_lib.find_last_checkpoint_epoch(self.model_files)
        if resume_at is None:
            self.setup_directory()
        logs_lib.setup_logging(self.run_dir)

        self.load_data()
        self.init_state()
        if resume_at is not None:
            self.load_checkpoint(resume_at)
            logging.info("resumed run %s at epoch %d", self.run_id, resume_at)
        self.resume_epoch = resume_at  # last completed epoch, None if fresh
        self.hook.on_startup(self)

        first_epoch = 0 if resume_at is None else resume_at + 1
        sharding = mesh_lib.batch_sharding(self.mesh) if self.mesh is not None else None
        root_key = jax.random.PRNGKey(self.config.seed)

        for epoch in range(first_epoch, self.config.epochs):
            self.hook.on_epoch_start(self, epoch)
            self._train_epoch(epoch, root_key, sharding)
            if self._need_validation(epoch):
                self._validate(epoch, sharding)
            self.hook.on_epoch_end(self, epoch)

        self.hook.on_termination(self)
        return self

    def _need_validation(self, epoch: int) -> bool:
        """``(epoch + 1) % nth == 0``, exactly the reference cadence
        (context.py:212-213): epochs nth-1, 2nth-1, ... — NOT epoch 0, and
        the last epoch only when nth divides epochs. All shipped configs use
        nth=1 (validate every epoch), where the formulas coincide."""
        return (epoch + 1) % self.config.valid_every_nth == 0

    def _train_epoch(self, epoch: int, root_key, sharding):
        loader = self.train_data.loader
        loader.set_epoch(epoch)  # per-epoch reseed parity (loops.py:149-151)
        epoch_key = jax.random.fold_in(root_key, epoch)
        nb_batches = self.train_data.nb_batches
        metric_sums: dict = {}
        nb = 0
        for i, batch in enumerate(prefetch(iter(loader), sharding=sharding)):
            step_key = jax.random.fold_in(epoch_key, i)
            self.state, metrics = self.train_step(
                self.state, *self.extra_step_args, batch, step_key)
            # metrics stay device scalars: accumulating them is async under
            # jax dispatch, so the loop never blocks on a step's result. Hooks
            # fetch at their own cadence (console every log_every_nth,
            # tensorboard once per epoch).
            for k, v in metrics.items():
                metric_sums[k] = metric_sums.get(k, 0.0) + v
            nb += 1
            self.hook.on_training_batch_end(self, epoch, i, nb_batches, metrics)
        means = {k: float(v) / max(nb, 1) for k, v in metric_sums.items()}
        self.hook.on_training_end(self, epoch, means)

    def _validate(self, epoch: int, sharding):
        asm = databuild.build_assembler(self.valid_data.dataset,
                                        self.config.valid_data.indexing,
                                        self.validation_entries)
        dataset = self.valid_data.dataset
        scores, subject_results = [], []
        for batch in prefetch(iter(self.valid_data.loader), sharding=sharding):
            outputs = self.predict_fn(self.state.params, self.state.batch_stats,
                                      batch)
            # one coalesced D2H per batch: per-leaf np.asarray costs a round
            # trip per array over a remote-TPU link (CLAUDE.md)
            fetched, subj_idx, slice_idx, valid = jax.device_get((
                {e: outputs[e] for e in self.validation_entries
                 if e in outputs},
                batch["subject_index"], batch["slice_index"],
                batch["valid"]))
            asm.add_batch(fetched, subj_idx, slice_idx, valid)
            for subject_index in asm.subjects_ready():
                subject_data = asm.get_assembled_subject(subject_index)
                info = databuild.direct_subject_info(dataset, subject_index)
                results, score = self.eval_subject_fn(subject_data, info)
                scores.append(score)
                subject_results.append(results)
                self.hook.on_validation_subject_end(self, epoch, info["subject"],
                                                    results)
        leftover = asm.flush()
        if leftover:
            logging.warning(
                "validation epoch %d: %d subject(s) were only partially "
                "assembled and were dropped: %s — check that valid_data has "
                "no slice-dropping selection strategy", epoch, len(leftover),
                [dataset.subjects[i] for i in leftover])
        if not scores:
            # never let an empty validation freeze a bogus 'best' checkpoint
            logging.warning("validation epoch %d produced no assembled "
                            "subjects; epoch not scored", epoch)
            self.hook.on_validation_end(self, epoch, float("nan"), False,
                                        subject_results)
            return
        score = float(np.mean(scores))
        is_best = self.best_score is None or score > self.best_score
        if is_best:
            self.best_score = score
        self.hook.on_validation_end(self, epoch, score, is_best, subject_results)
