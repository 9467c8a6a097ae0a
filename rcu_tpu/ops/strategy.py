"""Dict-in/dict-out evaluation-strategy protocol — API parity with the
reference metric library (common/evalutation/eval.py:9-226) for users porting
custom evaluation code.

Each strategy reads named entries from ``to_evaluate`` and writes results into
``results``; the compute underneath is the fused jittable kernels in
:mod:`rcu_tpu.ops`.
"""
from __future__ import annotations

import abc

import jax.numpy as jnp
import numpy as np

from rcu_tpu.ops import calibration as cal_ops
from rcu_tpu.ops import metrics as m_ops
from rcu_tpu.ops import uncertainty as u_ops


class EvaluationStrategy(abc.ABC):
    def __init__(self, result_entry=None):
        self.result_entry = result_entry

    @abc.abstractmethod
    def __call__(self, to_evaluate: dict, results: dict) -> None:
        ...


class EmptyEvaluation(EvaluationStrategy):
    def __call__(self, to_evaluate, results):
        pass


class ComposeEvaluation(EvaluationStrategy):
    def __init__(self, eval_strategies):
        super().__init__()
        self.eval_strategies = list(eval_strategies)

    def __call__(self, to_evaluate, results):
        for strategy in self.eval_strategies:
            strategy(to_evaluate, results)


class LambdaEvaluation(EvaluationStrategy):
    def __init__(self, lambda_fn, entry_keys: tuple, result_entry):
        super().__init__(result_entry)
        self.lambda_fn = lambda_fn
        self.entry_keys = tuple(entry_keys)

    def __call__(self, to_evaluate, results):
        results[self.result_entry] = self.lambda_fn(
            *(to_evaluate[k] for k in self.entry_keys))


class SmoothDice(EvaluationStrategy):
    def __init__(self, result_entry="smooth_dice"):
        super().__init__(result_entry)

    def __call__(self, to_evaluate, results):
        results[self.result_entry] = float(np.asarray(m_ops.smooth_dice(
            jnp.asarray(to_evaluate["prediction"]),
            jnp.asarray(to_evaluate["target"]))))


class Nll(EvaluationStrategy):
    def __init__(self, do_log=True, result_entry="nll"):
        super().__init__(result_entry)
        self.do_log = do_log

    def __call__(self, to_evaluate, results):
        results[self.result_entry] = float(np.asarray(m_ops.nll(
            jnp.asarray(to_evaluate["probabilities"]),
            jnp.asarray(to_evaluate["target"]), self.do_log)))


class LogLoss(EvaluationStrategy):
    def __init__(self, result_entry="ce"):
        super().__init__(result_entry)

    def __call__(self, to_evaluate, results):
        results[self.result_entry] = float(np.asarray(m_ops.log_loss(
            jnp.asarray(to_evaluate["probabilities"]),
            jnp.asarray(to_evaluate["target"]))))


class Dice(EvaluationStrategy):
    def __init__(self, result_entry="dice"):
        super().__init__(result_entry)

    def __call__(self, to_evaluate, results):
        results[self.result_entry] = float(np.asarray(m_ops.dice(
            jnp.asarray(to_evaluate["prediction"]),
            jnp.asarray(to_evaluate["target"]))))


class ConfusionMatrix(EvaluationStrategy):
    def __init__(self, result_entries=("tp", "tn", "fp", "fn", "n")):
        super().__init__(result_entries)

    def __call__(self, to_evaluate, results):
        counts = m_ops.confusion_counts(
            jnp.asarray(to_evaluate["prediction"]),
            jnp.asarray(to_evaluate["target"]))
        for key, value in zip(self.result_entry, counts):
            results[key] = int(np.asarray(value))


class EceBinary(EvaluationStrategy):
    def __init__(self, n_bins=10, result_entry="ece", threshold_range=None,
                 with_mask=False, return_bins=False, bin_weighting="proportion"):
        super().__init__(result_entry)
        self.n_bins = n_bins
        self.threshold_range = threshold_range
        self.with_mask = with_mask
        self.return_bins = return_bins
        self.bin_weighting = bin_weighting

    def __call__(self, to_evaluate, results):
        probs = jnp.asarray(to_evaluate["probabilities"])
        target = jnp.asarray(to_evaluate["target"])
        mask = jnp.asarray(to_evaluate["mask"]) if self.with_mask else None
        if self.threshold_range is not None:
            # expressed as a mask so bins stay available (the reference fills
            # out_bins regardless of threshold_range, numpyfunctions.py:6-23);
            # interval semantics single-sourced in ops/calibration.py
            mask = cal_ops.threshold_range_mask(probs, target,
                                                self.threshold_range, mask)
        ece, bins = cal_ops.ece_binary_with_bins(probs, target, mask,
                                                 self.n_bins, self.bin_weighting)
        if self.return_bins:
            results["bins_count"] = np.asarray(bins["bins_count"]).astype(np.int64)
            results["bins_avg_confidence"] = np.asarray(bins["bins_avg_confidence"])
            results["bins_positive_fraction"] = np.asarray(
                bins["bins_positive_fraction"])
            results["bins_non_zero"] = np.asarray(bins["bins_non_zero"])
        results[self.result_entry] = float(np.asarray(ece))


class UncertaintyErrorDice(EvaluationStrategy):
    """Thresholded-uncertainty error precision/recall/dice
    (reference eval.py:145-173)."""

    def __init__(self, uncertainty_threshold, result_prefix=None, with_mask=False):
        super().__init__()
        self.uncertainty_threshold = uncertainty_threshold
        self.prefix = "" if result_prefix is None else result_prefix + "_"
        self.with_mask = with_mask

    def __call__(self, to_evaluate, results):
        mask = None
        if self.with_mask:
            # the reference protocol spells this key 'target_boarder' (sic,
            # eval.py:164); accept both so dicts assembled to either contract
            # work. Cast to bool BEFORE inverting: `~` on a uint8 0/1 mask
            # would yield 255/254 weights, not a logical inverse.
            key = "target_boarder" if "target_boarder" in to_evaluate \
                else "target_border"
            mask = ~np.asarray(to_evaluate[key], dtype=bool)
        out = u_ops.uncertainty_error_metrics(
            jnp.asarray(to_evaluate["prediction"]),
            jnp.asarray(to_evaluate["target"]),
            jnp.asarray(to_evaluate["uncertainty"]),
            np.asarray([self.uncertainty_threshold], np.float32),
            mask=jnp.asarray(mask) if mask is not None else None)
        for key in ("precision", "recall", "dice"):
            results[f"{self.prefix}{key}"] = float(np.asarray(out[key])[0])


class UncertaintyAndCorrectionEval(EvaluationStrategy):
    """Full correction analysis at one threshold (reference eval.py:176-226)."""

    def __init__(self, uncertainty_threshold):
        super().__init__()
        self.uncertainty_threshold = uncertainty_threshold

    def __call__(self, to_evaluate, results):
        out = u_ops.correction_eval(
            jnp.asarray(to_evaluate["prediction"]),
            jnp.asarray(to_evaluate["target"]),
            jnp.asarray(to_evaluate["uncertainty"]),
            np.asarray([self.uncertainty_threshold], np.float32))
        from rcu_tpu.eval.actions import CORRECTION_KEYS, csv_value
        for key in CORRECTION_KEYS:
            results[key] = csv_value(key, np.asarray(out[key])[0])
