"""Direct numerical parity vs the REFERENCE implementation itself.

Loads /root/reference's ``common/evalutation/numpyfunctions.py`` (read-only,
with its pymia dependency stubbed — pymia is only needed by the dice/accuracy
wrappers we don't call) and compares its ece_binary / binary_calibration /
uncertainty outputs against our jitted kernels on identical random volumes.

This is the BASELINE.json parity gate ("ECE/Dice parity to 1e-3") checked
against the reference's actual code rather than a re-derived oracle.
Skipped when the reference checkout is not present.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_NP = "/root/reference/common/evalutation/numpyfunctions.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_NP),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_np():
    # stub the pymia metric module the reference imports at module scope
    for name in ("pymia", "pymia.evaluation", "pymia.evaluation.metric"):
        sys.modules.setdefault(name, types.ModuleType(name))
    spec = importlib.util.spec_from_file_location("ref_numpyfunctions", REF_NP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


RNG = np.random.RandomState(123)


class TestEceParity:
    def test_ece_binary_unmasked(self, ref_np):
        from rcu_tpu.ops import calibration
        probs = RNG.rand(9, 48, 48).astype(np.float32)
        target = (RNG.rand(9, 48, 48) < probs).astype(np.float64)
        expected = ref_np.ece_binary(probs.astype(np.float64), target)
        got = float(np.asarray(calibration.ece_binary(probs, target)))
        assert abs(got - expected) < 1e-5  # well inside the 1e-3 gate

    def test_ece_binary_masked_foreground(self, ref_np):
        from rcu_tpu.ops import calibration
        probs = RNG.rand(6, 40, 40).astype(np.float32)
        target = (RNG.rand(6, 40, 40) < 0.3).astype(np.float64)
        mask = RNG.rand(6, 40, 40) < 0.7
        expected = ref_np.ece_binary(probs.astype(np.float64), target, mask=mask)
        got = float(np.asarray(calibration.ece_binary(probs, target, mask=mask)))
        assert abs(got - expected) < 1e-5

    def test_ece_two_class_input_and_threshold_range(self, ref_np):
        from rcu_tpu.ops import calibration
        fg = RNG.rand(2000).astype(np.float32)
        probs2 = np.stack([1 - fg, fg], -1)
        target = (RNG.rand(2000) < fg).astype(np.float64)
        expected = ref_np.ece_binary(probs2.astype(np.float64), target,
                                     threshold_range=(0.1, 0.9))
        got = float(np.asarray(calibration.ece_binary(
            probs2, target, threshold_range=(0.1, 0.9))))
        assert abs(got - expected) < 1e-5

    def test_reliability_bins_match(self, ref_np):
        from rcu_tpu.ops import calibration
        probs = RNG.rand(5000).astype(np.float32)
        target = (RNG.rand(5000) < probs).astype(np.float64)
        r_frac, r_conf, r_count, r_nonzero = ref_np.binary_calibration(
            probs.astype(np.float64), target)
        pos_frac, mean_conf, bin_count, nonzero = [
            np.asarray(v) for v in calibration.binary_calibration(probs, target)]
        np.testing.assert_array_equal(nonzero, r_nonzero)
        np.testing.assert_allclose(bin_count[nonzero], r_count, rtol=0)
        np.testing.assert_allclose(pos_frac[nonzero], r_frac, atol=2e-6)
        np.testing.assert_allclose(mean_conf[nonzero], r_conf, atol=2e-6)


class TestUncertaintyParity:
    def test_confusion_overlap_counts(self, ref_np):
        from rcu_tpu.ops import uncertainty as u
        pred = RNG.rand(40, 40) < 0.4
        tgt = RNG.rand(40, 40) < 0.4
        thr = RNG.rand(40, 40) < 0.3
        expected = ref_np.uncertainty(pred, tgt, thr)
        # both return (tp, tn, fp, fn, tpu, tnu, fpu, fnu)
        got = [float(v) for v in u.uncertainty_counts(pred, tgt, thr)]
        np.testing.assert_allclose(got, expected)

    def test_error_metric_conventions(self, ref_np):
        from rcu_tpu.ops import uncertainty as u
        cases = [  # (fp, fn, tpu, tnu, fpu, fnu)
            (0, 0, 0, 0, 0, 0),
            (3, 2, 1, 4, 2, 1),
            (5, 0, 0, 0, 0, 0),
        ]
        for fp, fn, tpu, tnu, fpu, fnu in cases:
            np.testing.assert_allclose(
                float(u.error_dice(fp, fn, tpu, tnu, fpu, fnu)),
                ref_np.error_dice(fp, fn, tpu, tnu, fpu, fnu), rtol=1e-6)
            np.testing.assert_allclose(
                float(u.error_recall(fp, fn, fpu, fnu)),
                ref_np.error_recall(fp, fn, fpu, fnu), rtol=1e-6)
            np.testing.assert_allclose(
                float(u.error_precision(tpu, tnu, fpu, fnu)),
                ref_np.error_precision(tpu, tnu, fpu, fnu), rtol=1e-6)

    def test_entropy_convention(self, ref_np):
        from rcu_tpu.ops import metrics
        p = RNG.rand(64, 2)
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(metrics.entropy(p)),
                                   ref_np.entropy(p), atol=1e-6)


@pytest.fixture(scope="module")
def ref_helper():
    """reference rechun/eval/helper.py (csv+numpy only, no stubbing needed)."""
    path = "/root/reference/rechun/eval/helper.py"
    spec = importlib.util.spec_from_file_location("ref_helper", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestPrepareParity:
    def test_fg_prob_folding(self, ref_helper):
        from rcu_tpu.ops import prepare
        u = RNG.rand(300).astype(np.float64)
        pred = (RNG.rand(300) < 0.5).astype(np.uint8)
        expected = ref_helper.uncertainty_to_foreground_probabilities(
            u.copy(), pred)
        got = np.asarray(prepare.uncertainty_to_foreground_probabilities(
            u.astype(np.float32), pred))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_rescale_eps(self, ref_helper):
        from rcu_tpu.ops import prepare
        x = RNG.randn(200) * 4
        expected = ref_helper.rescale_uncertainties(x, x.min(), x.max())
        got = np.asarray(prepare.rescale_linear(
            x.astype(np.float32), float(x.min()), float(x.max())))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_add_background(self, ref_helper):
        from rcu_tpu.ops import prepare
        p = RNG.rand(40, 40)
        expected = ref_helper.add_background_probability(p)
        got = np.asarray(prepare.add_background_probability(
            p.astype(np.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_check_min_max(self, ref_helper):
        from rcu_tpu.ops import prepare
        ok = np.asarray([0.1, 0.9])
        bad = np.asarray([0.1, 1.5])
        prepare.check_min_max(ok)
        ref_helper.check_min_max(ok)
        with pytest.raises(ValueError):
            prepare.check_min_max(bad)
        with pytest.raises(ValueError):
            ref_helper.check_min_max(bad)
        with pytest.warns(UserWarning):
            prepare.check_min_max(bad, only_warn=True)
