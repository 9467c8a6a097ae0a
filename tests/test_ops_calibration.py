"""Golden tests for ECE/reliability binning against a numpy digitize oracle.

The oracle re-implements the reference algorithm (numpyfunctions.py:6-83)
literally: linspace(0, 1+1e-8, n+1) edges, digitize, bincount, nonzero-bin
compression, four bin weightings.
"""
import numpy as np
import pytest

from rcu_tpu.ops import calibration

RNG = np.random.RandomState(3)


def oracle_binary_calibration(target, probs, n_bins=10):
    bins = np.linspace(0.0, 1.0 + 1e-8, n_bins + 1)
    binids = np.digitize(probs, bins) - 1
    bin_sums = np.bincount(binids, weights=probs, minlength=n_bins)
    bin_true = np.bincount(binids, weights=target, minlength=n_bins)
    bin_total = np.bincount(binids, minlength=n_bins)
    nonzero = bin_total != 0
    prob_true = bin_true[nonzero] / bin_total[nonzero]
    prob_pred = bin_sums[nonzero] / bin_total[nonzero]
    return prob_true, prob_pred, bin_total[nonzero], nonzero


def oracle_ece(probs, target, n_bins=10, mask=None, threshold_range=None,
               bin_weighting="proportion"):
    n_dim = target.ndim
    if probs.ndim > target.ndim:
        probs = probs[..., 1]
    if mask is not None:
        probs, target = probs[mask], target[mask]
    if threshold_range is not None:
        low, up = threshold_range
        m = np.logical_and(probs < up, probs > low)
        probs, target = probs[m], target[m]
    pos_frac, mean_conf, bin_count, nonzero = oracle_binary_calibration(
        target.flatten(), probs.flatten(), n_bins)
    if bin_weighting == "proportion":
        w = bin_count / bin_count.sum()
    elif bin_weighting == "log_proportion":
        w = np.log(bin_count) / np.log(bin_count).sum()
    elif bin_weighting == "power_proportion":
        w = bin_count ** (1 / n_dim) / (bin_count ** (1 / n_dim)).sum()
    elif bin_weighting == "mean_proportion":
        w = 1 / nonzero.sum()
    return (np.abs(mean_conf - pos_frac) * w).sum()


class TestBinIds:
    def test_matches_digitize_on_random(self):
        probs = RNG.rand(10000).astype(np.float32)
        bins = np.linspace(0.0, 1.0 + 1e-8, 11)
        expected = np.digitize(probs.astype(np.float64), bins) - 1
        got = np.asarray(calibration.bin_ids(probs))
        assert (got == expected).mean() > 0.9999  # ULP-edge collisions only

    def test_exact_special_values(self):
        probs = np.array([0.0, 0.5, 1.0, 1e-5, 1 - 1e-5], np.float32)
        got = np.asarray(calibration.bin_ids(probs))
        np.testing.assert_array_equal(got, [0, 4, 9, 0, 9])


class TestBinaryCalibration:
    def test_matches_oracle(self):
        probs = RNG.rand(5000).astype(np.float32)
        target = (RNG.rand(5000) < probs).astype(np.float64)
        o_true, o_pred, o_count, o_nonzero = oracle_binary_calibration(target, probs)
        pos_frac, mean_conf, bin_count, nonzero = [
            np.asarray(v) for v in calibration.binary_calibration(probs, target)]
        np.testing.assert_array_equal(nonzero, o_nonzero)
        np.testing.assert_allclose(bin_count[nonzero], o_count, rtol=1e-6)
        np.testing.assert_allclose(pos_frac[nonzero], o_true, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(mean_conf[nonzero], o_pred, rtol=1e-4, atol=1e-5)

    def test_two_class_probability_input(self):
        fg = RNG.rand(800).astype(np.float32)
        probs2 = np.stack([1 - fg, fg], -1)
        target = (RNG.rand(800) < 0.4).astype(np.float32)
        a = [np.asarray(v) for v in calibration.binary_calibration(probs2, target)]
        b = [np.asarray(v) for v in calibration.binary_calibration(fg, target)]
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-6)

    def test_empty_bins(self):
        probs = np.full(100, 0.55, np.float32)  # single occupied bin
        target = np.ones(100, np.float32)
        pos_frac, mean_conf, bin_count, nonzero = [
            np.asarray(v) for v in calibration.binary_calibration(probs, target)]
        assert nonzero.sum() == 1 and nonzero[5]
        assert bin_count[5] == 100
        np.testing.assert_allclose(mean_conf[5], 0.55, rtol=1e-6)
        np.testing.assert_allclose(pos_frac[5], 1.0)


class TestEce:
    @pytest.mark.parametrize("weighting", [
        "proportion", "log_proportion", "power_proportion", "mean_proportion"])
    def test_matches_oracle_weightings(self, weighting):
        probs = RNG.rand(64, 64).astype(np.float32)
        target = (RNG.rand(64, 64) < probs).astype(np.float64)
        expected = oracle_ece(probs, target, bin_weighting=weighting)
        got = np.asarray(calibration.ece_binary(probs, target, bin_weighting=weighting))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)

    def test_masked_matches_oracle(self):
        probs = RNG.rand(32, 32, 8).astype(np.float32)
        target = (RNG.rand(32, 32, 8) < 0.3).astype(np.float64)
        mask = RNG.rand(32, 32, 8) < 0.6
        expected = oracle_ece(probs, target, mask=mask)
        got = np.asarray(calibration.ece_binary(probs, target, mask=mask))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)

    def test_threshold_range(self):
        probs = RNG.rand(2000).astype(np.float32)
        target = (RNG.rand(2000) < probs).astype(np.float64)
        expected = oracle_ece(probs, target, threshold_range=(0.2, 0.8))
        got = np.asarray(calibration.ece_binary(probs, target, threshold_range=(0.2, 0.8)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)

    def test_perfectly_calibrated_degenerate(self):
        probs = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.float32)
        target = np.concatenate([np.zeros(50), np.ones(50)]).astype(np.float64)
        got = np.asarray(calibration.ece_binary(probs, target))
        np.testing.assert_allclose(got, 0.0, atol=1e-7)

    def test_bins_output_expanded_schema(self):
        probs = RNG.rand(500).astype(np.float32)
        target = (RNG.rand(500) < 0.5).astype(np.float32)
        ece, bins = calibration.ece_binary_with_bins(probs, target)
        for key in ("bins_count", "bins_avg_confidence", "bins_positive_fraction",
                    "bins_non_zero"):
            assert np.asarray(bins[key]).shape == (10,)
