"""Offline-eval metric passes (parity surface: bin-eval/eval_uncertainty.py).

Each pass is ONE load-prepare-reduce unit over a run's subjects: a NIfTI load
spec, an optional prepare pipeline (rescales/entropy folding), a fused device
reduction, and the CSV sink(s) it feeds. The reference composes these from an
action/case class hierarchy with one numpy evaluation object per metric and
per threshold; here a single :class:`MetricPass` is configured by plain
builder functions and the threshold axis is vmapped on device — the
correction pass computes all 11 thresholds' CSV rows in one dispatch.

The four-step driver protocol (``setup_eval``/``start_eval``/``eval_subject``/
``finish_eval``) keeps the reference runner's method names so scripts ported
from it keep working; everything else is this project's own shape. CSV
filenames, column orders, and the ``_rescale``/``_globalrescale`` result-id
suffixes are frozen artifact contracts.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from rcu_tpu import directories as dirs
from rcu_tpu.eval import analysis, hooks as ev_hooks, kernels
from rcu_tpu.eval.evaldata import EvalData

# CSV column order of the reference's correction result rows
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

ALL_THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


def csv_value(key: str, value):
    """Device scalar -> the python type the CSV column carries."""
    v = np.asarray(value)
    if key in _COUNT_KEYS:
        return int(v)
    if key in _BOOL_KEYS:
        return bool(v)
    return float(v)


class MetricPass:
    """A configurable eval pass. ``configure(pass_, eval_data, kern)`` is
    called once per run (after the run's confidence entry and result id are
    known) and must set ``id_``, ``load_spec``, ``prepare``, ``sinks`` and
    ``measure`` (sample dict -> one row dict per sink). ``kern`` is the fused
    single-device kernel suite, or its mesh-sharded twin when the pass was
    built with a device mesh.
    """

    def __init__(self, configure, mesh=None):
        self._configure = configure
        self.mesh = mesh
        self.id_ = ""
        self.load_spec = {}
        self.prepare = None
        self.sinks = ()
        self.measure = None
        self._history = {}

    def _kernel_suite(self):
        if self.mesh is None:
            return kernels
        from rcu_tpu.parallel.inference import ShardedSubjectEval
        return ShardedSubjectEval(self.mesh)

    # ------ driver protocol (method names shared with the reference runner)
    def setup_eval(self, eval_data: EvalData):
        # passes are reused across runs (the runner loops EvalData entries):
        # history must start empty or run N's summary (e.g. the minmax
        # bounds) would aggregate every earlier run's subjects too
        self._history = {}
        self._configure(self, eval_data, self._kernel_suite())

    def start_eval(self):
        print(self.id_)
        for sink in self.sinks:
            sink.on_run_start(self.id_)

    def eval_subject(self, sf, loader: analysis.Loader):
        sample = loader.get_data(sf, **self.load_spec)
        if self.prepare:
            sample = self.prepare(sample)
        rows = self.measure(sample)
        for sink, row in zip(self.sinks, rows):
            sink.on_subject(row, sf.subject, self.id_)
            for key, value in row.items():
                self._history.setdefault(key, []).append(value)

    def finish_eval(self):
        for sink in self.sinks:
            sink.on_run_end(self._history, self.id_)


def minmax_pass(min_max_dir: str, mesh=None) -> MetricPass:
    """Global min/max of the run's confidence entry; the summary CSV it
    writes is the prerequisite of every ``global`` rescale pass."""
    os.makedirs(min_max_dir, exist_ok=True)

    def configure(p, eval_data, kern):
        prep, p.id_ = analysis.get_confidence_entry_preparation(
            eval_data, "probabilities")
        p.prepare = analysis.ComposePreparation([prep])
        p.load_spec = {"entry": eval_data.confidence_entry}
        p.sinks = (ev_hooks.WriteSummaryCsvHook(
            os.path.join(min_max_dir, dirs.MINMAX_PLACEHOLDER.format(p.id_)),
            confidence_entry=eval_data.confidence_entry),)

        def measure(sample):
            out = kern.min_max(jnp.asarray(sample["probabilities"]))
            return [{"min": float(np.asarray(out["min"])),
                     "max": float(np.asarray(out["max"]))}]
        p.measure = measure

    return MetricPass(configure, mesh)


def ece_pass(base_dir: str, details: str, rescale_confidence="subject",
             rescale_sigma="subject", min_max_dir: str = None,
             mesh=None) -> MetricPass:
    """ECE (+t2-foreground mask for brats) + dice + confusion counts."""
    masked = details == "foreground"
    out_dir = os.path.join(
        base_dir, dirs.ECE_FOREGROUND_NAME if masked else dirs.ECE_NAME)
    os.makedirs(out_dir, exist_ok=True)
    columns = ("ece", "dice", "tp", "tn", "fp", "fn", "n")

    def configure(p, eval_data, kern):
        p.prepare, p.id_ = analysis.get_probability_preparation(
            eval_data, rescale_confidence=rescale_confidence,
            rescale_sigma=rescale_sigma, min_max_dir=min_max_dir)
        p.load_spec = {"entry": eval_data.confidence_entry, "t2_mask": masked}
        p.sinks = (ev_hooks.WriteCsvHook(
            os.path.join(out_dir, dirs.ECE_PLACEHOLDER.format(p.id_)),
            entries=columns),)

        def measure(sample):
            out = kern.ece_dice_confusion(
                jnp.asarray(sample["probabilities"]),
                jnp.asarray(sample["target"]),
                jnp.asarray(sample["prediction"]),
                jnp.asarray(sample["mask"]) if masked else None)
            return [{k: csv_value(k, out[k]) for k in columns}]
        p.measure = measure

    return MetricPass(configure, mesh)


def calibration_pass(base_dir: str, details: str = "",
                     rescale_confidence="subject", rescale_sigma="subject",
                     min_max_dir: str = None, mesh=None) -> MetricPass:
    """ECE + the 4x10 reliability-bin vectors + dice; bins unfold to the
    ``bins_*_00..09`` CSV columns in the sink."""
    masked = details == "foreground"
    out_dir = os.path.join(base_dir, dirs.CALIB_NAME)
    os.makedirs(out_dir, exist_ok=True)

    def configure(p, eval_data, kern):
        p.prepare, p.id_ = analysis.get_probability_preparation(
            eval_data, rescale_confidence=rescale_confidence,
            rescale_sigma=rescale_sigma, min_max_dir=min_max_dir)
        p.load_spec = {"entry": eval_data.confidence_entry, "t2_mask": masked}
        p.sinks = (ev_hooks.WriteBinsCsvHook(os.path.join(
            out_dir, dirs.CALIBRATION_PLACEHOLDER.format(p.id_))),)

        def measure(sample):
            out = kern.calibration_bins(
                jnp.asarray(sample["probabilities"]),
                jnp.asarray(sample["target"]),
                jnp.asarray(sample["prediction"]),
                jnp.asarray(sample["mask"]) if masked else None)
            # column order: bin vectors first, then ece, then dice (the
            # reference's result-insertion order — a frozen CSV contract)
            return [{
                "bins_count": np.asarray(out["bins_count"]).astype(np.int64),
                "bins_avg_confidence": np.asarray(out["bins_avg_confidence"]),
                "bins_positive_fraction":
                    np.asarray(out["bins_positive_fraction"]),
                "bins_non_zero": np.asarray(out["bins_non_zero"]),
                "ece": float(np.asarray(out["ece"])),
                "dice": float(np.asarray(out["dice"])),
            }]
        p.measure = measure

    return MetricPass(configure, mesh)


def correction_pass(thresholds, base_dir: str, rescale_confidence="",
                    rescale_sigma="global", min_max_dir: str = None,
                    mesh=None) -> MetricPass:
    """Uncertainty/correction analysis: the whole threshold vector is one
    vmapped device reduction whose rows fan out to one CSV sink per
    threshold (the reference runs one numpy evaluation per threshold)."""
    thresholds = tuple(thresholds)
    # the CSV filename encodes thresholds at two decimals (the reference's
    # contract): custom thresholds that collide there (0.125 vs 0.12) would
    # silently overwrite each other's sink — fail loudly instead
    codes = [f"{t:.2f}".replace(".", "") for t in thresholds]
    if len(set(codes)) != len(codes):
        raise ValueError(
            f"thresholds {thresholds} collide in the two-decimal CSV "
            f"filename encoding ({codes}); choose thresholds distinct at "
            "two decimals")
    out_dir = os.path.join(base_dir, dirs.UNCERTAINTY_NAME)
    os.makedirs(out_dir, exist_ok=True)
    threshold_arr = np.asarray(thresholds, np.float32)

    def configure(p, eval_data, kern):
        p.prepare, p.id_ = analysis.get_uncertainty_preparation(
            eval_data, rescale_confidence=rescale_confidence,
            rescale_sigma=rescale_sigma, min_max_dir=min_max_dir)
        p.load_spec = {"entry": eval_data.confidence_entry}
        p.sinks = tuple(
            ev_hooks.WriteCsvHook(
                os.path.join(out_dir, dirs.UNCERTAINTY_PLACEHOLDER.format(
                    p.id_, f"{t:.2f}".replace(".", ""))), None)
            for t in thresholds)

        def measure(sample):
            out = kern.correction_eval(
                jnp.asarray(sample["prediction"]),
                jnp.asarray(sample["target"]),
                jnp.asarray(sample["uncertainty"]), threshold_arr)
            out = {k: np.asarray(v) for k, v in out.items()}
            return [{k: csv_value(k, out[k][ti]) for k in CORRECTION_KEYS}
                    for ti in range(len(thresholds))]
        p.measure = measure

    return MetricPass(configure, mesh)


_PASS_BUILDERS = {
    "minmax": lambda min_max_dir, base_dir, details, mesh:
        minmax_pass(min_max_dir, mesh=mesh),
    "ece_dice": lambda min_max_dir, base_dir, details, mesh:
        ece_pass(base_dir, details, rescale_confidence="subject",
                 rescale_sigma="global", min_max_dir=min_max_dir, mesh=mesh),
    "calib": lambda min_max_dir, base_dir, details, mesh:
        calibration_pass(base_dir, details, rescale_confidence="subject",
                         rescale_sigma="global", min_max_dir=min_max_dir,
                         mesh=mesh),
    "bnf_ue": lambda min_max_dir, base_dir, details, mesh:
        correction_pass(ALL_THRESHOLDS, base_dir,
                        rescale_confidence="subject", rescale_sigma="global",
                        min_max_dir=min_max_dir, mesh=mesh),
}


def get_actions(action_names, min_max_dir, base_dir, ece_details, mesh=None):
    """Action-name registry (CLI surface parity; same names and default
    rescale wiring as the reference's runner). With a ``mesh`` every pass's
    reduction shards subject volumes over it."""
    return [_PASS_BUILDERS[name](min_max_dir, base_dir, ece_details, mesh)
            for name in action_names if name in _PASS_BUILDERS]
