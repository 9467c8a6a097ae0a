"""Evaluation actions (reference bin-eval/eval_uncertainty.py:58-244).

Same action/case framework and CSV outputs; the per-subject metric pass runs
as fused jitted kernels on device instead of numpy. The CorrectionAction's 11
thresholds are one vmapped program producing all 11 CSV rows per subject in a
single device pass (reference runs 11 sequential numpy evaluations).
"""
from __future__ import annotations

import abc
import os

import jax.numpy as jnp
import numpy as np

from rcu_tpu import directories as dirs
from rcu_tpu.eval import analysis, hooks as ev_hooks, kernels
from rcu_tpu.eval.evaldata import EvalData

# CSV column order of the reference UncertaintyAndCorrectionEvalNumpy results
CORRECTION_KEYS = (
    "tpu", "tnu", "fpu", "fnu", "tp", "tn", "fp", "fn",
    "dice_benefit", "accuracy_benefit", "dice", "accuracy",
    "corrected_dice", "corrected_accuracy",
    "dice_benefit_correct", "accuracy_benefit_correct",
    "corrected_add_dice", "corrected_add_accuracy",
)
_COUNT_KEYS = {"tpu", "tnu", "fpu", "fnu", "tp", "tn", "fp", "fn", "n"}
_BOOL_KEYS = {"dice_benefit", "accuracy_benefit", "dice_benefit_correct",
              "accuracy_benefit_correct"}


def _pyval(key: str, value):
    """Device scalar -> the python type the reference CSVs carry."""
    v = np.asarray(value)
    if key in _COUNT_KEYS:
        return int(v)
    if key in _BOOL_KEYS:
        return bool(v)
    return float(v)


def _make_dir_if_not_exists(directory):
    os.makedirs(directory, exist_ok=True)


class EvalCase:
    def __init__(self, metric_fn, hook, id_: str = ""):
        self.result_history = {}
        self.metric_fn = metric_fn
        self.hook = hook
        self.id_ = id_

    def do_eval(self, to_eval: dict, subject_name: str, id_: str):
        results = self.metric_fn(to_eval)
        self.hook.on_subject(results, subject_name, id_)
        for k, v in results.items():
            self.result_history.setdefault(k, []).append(v)


class EvalAction(abc.ABC):
    def __init__(self, mesh=None):
        self.load_spec = {}
        self.prepare = None
        self.eval_cases = []
        self.id_ = ""
        self.mesh = mesh

    def _kernels(self):
        """Single-device fused kernels, or the mesh-sharded equivalents (same
        method names/signatures; rcu_tpu.parallel.inference)."""
        if self.mesh is None:
            return kernels
        from rcu_tpu.parallel.inference import ShardedSubjectEval
        return ShardedSubjectEval(self.mesh)

    @abc.abstractmethod
    def _setup_eval(self, eval_data: EvalData):
        ...

    def setup_eval(self, eval_data: EvalData):
        self._setup_eval(eval_data)

    def start_eval(self):
        sub_ids = ", ".join(c.id_ for c in self.eval_cases if c.id_)
        print(self.id_ + sub_ids)
        for case in self.eval_cases:
            case.hook.on_run_start(self.id_)

    def eval_subject(self, sf, loader: analysis.Loader):
        to_eval = loader.get_data(sf, **self.load_spec)
        if self.prepare:
            to_eval = self.prepare(to_eval)
        for case in self.eval_cases:
            case.do_eval(to_eval, sf.subject, self.id_)

    def finish_eval(self):
        for case in self.eval_cases:
            case.hook.on_run_end(case.result_history, self.id_)


class SaveMinMaxAction(EvalAction):
    """Global min/max of the confidence entry (reference :205-223)."""

    def __init__(self, min_max_dir: str, mesh=None):
        super().__init__(mesh)
        self.min_max_dir = min_max_dir
        _make_dir_if_not_exists(min_max_dir)

    def _setup_eval(self, eval_data: EvalData):
        self.prepare, self.id_ = analysis.get_confidence_entry_preparation(
            eval_data, "probabilities")
        self.prepare = analysis.ComposePreparation([self.prepare])
        self.load_spec = {"entry": eval_data.confidence_entry}

        kern = self._kernels()

        def metric(to_eval):
            out = kern.min_max(jnp.asarray(to_eval["probabilities"]))
            return {"min": float(np.asarray(out["min"])),
                    "max": float(np.asarray(out["max"]))}

        hook = ev_hooks.WriteSummaryCsvHook(
            os.path.join(self.min_max_dir,
                         dirs.MINMAX_PLACEHOLDER.format(self.id_)),
            confidence_entry=eval_data.confidence_entry)
        self.eval_cases = [EvalCase(metric, hook)]


class EceAction(EvalAction):
    """ECE (+fg mask for brats) + dice + confusion (reference :141-173)."""

    def __init__(self, base_dir: str, details: str, rescale_confidence="subject",
                 rescale_sigma="subject", min_max_dir: str = None, mesh=None):
        super().__init__(mesh)
        self.rescale_confidence = rescale_confidence
        self.rescale_sigma = rescale_sigma
        self.min_max_dir = min_max_dir
        self.need_t2_mask = details == "foreground"
        self.out_dir = os.path.join(
            base_dir, dirs.ECE_FOREGROUND_NAME if self.need_t2_mask else dirs.ECE_NAME)
        _make_dir_if_not_exists(self.out_dir)

    def _setup_eval(self, eval_data: EvalData):
        self.prepare, self.id_ = analysis.get_probability_preparation(
            eval_data, rescale_confidence=self.rescale_confidence,
            rescale_sigma=self.rescale_sigma, min_max_dir=self.min_max_dir)
        self.load_spec = {"entry": eval_data.confidence_entry,
                          "t2_mask": self.need_t2_mask}

        need_mask = self.need_t2_mask
        kern = self._kernels()

        def metric(to_eval):
            mask = jnp.asarray(to_eval["mask"]) if need_mask else None
            out = kern.ece_dice_confusion(
                jnp.asarray(to_eval["probabilities"]),
                jnp.asarray(to_eval["target"]),
                jnp.asarray(to_eval["prediction"]), mask)
            ordered = {}
            for k in ("ece", "dice", "tp", "tn", "fp", "fn", "n"):
                ordered[k] = _pyval(k, out[k])
            return ordered

        hook = ev_hooks.ComposeEvalHook([ev_hooks.WriteCsvHook(
            os.path.join(self.out_dir, dirs.ECE_PLACEHOLDER.format(self.id_)),
            entries=("ece", "dice", "tp", "tn", "fp", "fn", "n"))])
        self.eval_cases = [EvalCase(metric, hook)]


class EceCalibrationAction(EvalAction):
    """ECE + 4x10 reliability bins + dice (reference :112-138)."""

    def __init__(self, base_dir: str, details: str = "",
                 rescale_confidence="subject", rescale_sigma="subject",
                 min_max_dir: str = None, mesh=None):
        super().__init__(mesh)
        self.need_mask = details == "foreground"
        self.rescale_confidence = rescale_confidence
        self.rescale_sigma = rescale_sigma
        self.min_max_dir = min_max_dir
        self.out_dir = os.path.join(base_dir, dirs.CALIB_NAME)
        _make_dir_if_not_exists(self.out_dir)

    def _setup_eval(self, eval_data: EvalData):
        self.prepare, self.id_ = analysis.get_probability_preparation(
            eval_data, rescale_confidence=self.rescale_confidence,
            rescale_sigma=self.rescale_sigma, min_max_dir=self.min_max_dir)
        self.load_spec = {"entry": eval_data.confidence_entry,
                          "t2_mask": self.need_mask}

        need_mask = self.need_mask
        kern = self._kernels()

        def metric(to_eval):
            mask = jnp.asarray(to_eval["mask"]) if need_mask else None
            out = kern.calibration_bins(
                jnp.asarray(to_eval["probabilities"]),
                jnp.asarray(to_eval["target"]),
                jnp.asarray(to_eval["prediction"]), mask)
            # reference insertion order: bins first (out_bins side effect),
            # then ece, then dice (numpyfunctions.py:16-20, eval.py:118-142)
            return {
                "bins_count": np.asarray(out["bins_count"]).astype(np.int64),
                "bins_avg_confidence": np.asarray(out["bins_avg_confidence"]),
                "bins_positive_fraction": np.asarray(out["bins_positive_fraction"]),
                "bins_non_zero": np.asarray(out["bins_non_zero"]),
                "ece": float(np.asarray(out["ece"])),
                "dice": float(np.asarray(out["dice"])),
            }

        hook = ev_hooks.ComposeEvalHook([ev_hooks.WriteBinsCsvHook(
            os.path.join(self.out_dir,
                         dirs.CALIBRATION_PLACEHOLDER.format(self.id_)))])
        self.eval_cases = [EvalCase(metric, hook)]


class CorrectionAction(EvalAction):
    """Uncertainty/correction analysis at all thresholds in ONE device pass
    (reference :176-202 runs one python object per threshold)."""

    def __init__(self, thresholds: list, base_dir: str, rescale_confidence="",
                 rescale_sigma="global", min_max_dir: str = None, mesh=None):
        super().__init__(mesh)
        self.thresholds = list(thresholds)
        self.rescale_confidence = rescale_confidence
        self.rescale_sigma = rescale_sigma
        self.min_max_dir = min_max_dir
        self.out_dir = os.path.join(base_dir, dirs.UNCERTAINTY_NAME)
        _make_dir_if_not_exists(self.out_dir)

    def _setup_eval(self, eval_data: EvalData):
        self.prepare, self.id_ = analysis.get_uncertainty_preparation(
            eval_data, rescale_confidence=self.rescale_confidence,
            rescale_sigma=self.rescale_sigma, min_max_dir=self.min_max_dir)
        self.load_spec = {"entry": eval_data.confidence_entry}

        thresholds = np.asarray(self.thresholds, np.float32)
        kern = self._kernels()
        hooks_per_th = []
        for threshold in self.thresholds:
            threshold_str = f"{threshold:.2f}".replace(".", "")
            out_csv = os.path.join(self.out_dir, dirs.UNCERTAINTY_PLACEHOLDER
                                   .format(self.id_, threshold_str))
            hooks_per_th.append(ev_hooks.WriteCsvHook(out_csv, None))

        action = self

        class _FusedCase:
            """One device pass, fanned out to the per-threshold CSV hooks."""

            def __init__(self):
                self.id_ = ""
                self.hooks = hooks_per_th
                self.result_history = {}

            @property
            def hook(self):  # for start/finish fan-out
                outer = self

                class _H:
                    def on_run_start(self, run_id):
                        for h in outer.hooks:
                            h.on_run_start(run_id)

                    def on_run_end(self, history, run_id):
                        for h in outer.hooks:
                            h.on_run_end(history, run_id)
                return _H()

            def do_eval(self, to_eval, subject_name, id_):
                out = kern.correction_eval(
                    jnp.asarray(to_eval["prediction"]),
                    jnp.asarray(to_eval["target"]),
                    jnp.asarray(to_eval["uncertainty"]),
                    thresholds)
                out = {k: np.asarray(v) for k, v in out.items()}
                for ti, h in enumerate(self.hooks):
                    row = {k: _pyval(k, out[k][ti]) for k in CORRECTION_KEYS}
                    h.on_subject(row, subject_name, id_)
                    for k, v in row.items():
                        self.result_history.setdefault(k, []).append(v)

        self.eval_cases = [_FusedCase()]


def get_actions(action_names, min_max_dir, base_dir, ece_details, mesh=None):
    """Reference :226-244 — same names, same default rescale wiring. With a
    ``mesh`` every action's reduction pass shards subject volumes over it."""
    actions = []
    for action_name in action_names:
        action = None
        if action_name == "minmax":
            action = SaveMinMaxAction(min_max_dir, mesh=mesh)
        elif action_name == "ece_dice":
            action = EceAction(base_dir, ece_details, rescale_confidence="subject",
                               rescale_sigma="global", min_max_dir=min_max_dir,
                               mesh=mesh)
        elif action_name == "calib":
            action = EceCalibrationAction(base_dir, ece_details,
                                          rescale_confidence="subject",
                                          rescale_sigma="global",
                                          min_max_dir=min_max_dir, mesh=mesh)
        elif action_name == "bnf_ue":
            action = CorrectionAction(
                [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95],
                base_dir, rescale_confidence="subject", rescale_sigma="global",
                min_max_dir=min_max_dir, mesh=mesh)
        if action is not None:
            actions.append(action)
    return actions
