"""Equivalence tests: Pallas fused eval kernel vs the lax reference path
(interpret mode on the CPU backend)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rcu_tpu.eval import kernels as lax_kernels
from rcu_tpu.ops.pallas import evalstats

RNG = np.random.RandomState(31)
THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


@pytest.fixture(scope="module")
def subject():
    shape = (5, 40, 40)  # deliberately not a multiple of the block size
    fg = RNG.rand(*shape).astype(np.float32)
    target = (RNG.rand(*shape) < 0.3).astype(np.float32)
    prediction = (fg > 0.5).astype(np.float32)
    unc = RNG.rand(*shape).astype(np.float32)
    mask = (RNG.rand(*shape) < 0.8)
    return fg, target, prediction, unc, mask


class TestFusedEvalStats:
    def test_bins_match_lax(self, subject):
        fg, target, prediction, unc, mask = subject
        bins, confusion, correction = evalstats.fused_subject_eval(
            jnp.asarray(fg), jnp.asarray(target), jnp.asarray(prediction),
            jnp.asarray(unc), jnp.asarray(mask, jnp.float32), THRESHOLDS,
            interpret=True)
        ref = lax_kernels.calibration_bins(
            jnp.asarray(fg), jnp.asarray(target), jnp.asarray(prediction),
            jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(bins["bins_count"]),
                                   np.asarray(ref["bins_count"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(bins["bins_avg_confidence"]),
                                   np.asarray(ref["bins_avg_confidence"]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bins["ece"]),
                                   np.asarray(ref["ece"]), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(confusion["dice"]),
                                   np.asarray(ref["dice"]), rtol=1e-5)

    def test_confusion_exact(self, subject):
        fg, target, prediction, unc, mask = subject
        _, confusion, _ = evalstats.fused_subject_eval(
            jnp.asarray(fg), jnp.asarray(target), jnp.asarray(prediction),
            jnp.asarray(unc), None, THRESHOLDS, interpret=True)
        p, t = prediction.astype(bool), target.astype(bool)
        assert float(confusion["tp"]) == np.sum(p & t)
        assert float(confusion["tn"]) == np.sum(~p & ~t)
        assert float(confusion["fp"]) == np.sum(p & ~t)
        assert float(confusion["fn"]) == np.sum(~p & t)

    def test_correction_matches_lax(self, subject):
        fg, target, prediction, unc, mask = subject
        _, _, correction = evalstats.fused_subject_eval(
            jnp.asarray(fg), jnp.asarray(target), jnp.asarray(prediction),
            jnp.asarray(unc), None, THRESHOLDS, interpret=True)
        ref = lax_kernels.correction_eval(
            jnp.asarray(prediction), jnp.asarray(target), jnp.asarray(unc),
            jnp.asarray(THRESHOLDS))
        for key in ("tpu", "fpu", "tnu", "fnu", "corrected_dice",
                    "corrected_add_dice", "dice_benefit"):
            np.testing.assert_allclose(np.asarray(correction[key]),
                                       np.asarray(ref[key]), rtol=1e-5,
                                       atol=1e-6, err_msg=key)
