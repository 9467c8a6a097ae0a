"""Golden tests for rcu_tpu.ops.metrics against numpy/sklearn oracles."""
import numpy as np
import pytest
import sklearn.metrics as skm

from rcu_tpu.ops import metrics

RNG = np.random.RandomState(7)


def _random_binary(shape, p=0.3, rng=RNG):
    return (rng.rand(*shape) < p).astype(np.uint8)


class TestConfusion:
    def test_counts_match_numpy(self):
        pred = _random_binary((13, 17))
        tgt = _random_binary((13, 17))
        tp, tn, fp, fn, n = [np.asarray(v) for v in metrics.confusion_counts(pred, tgt)]
        p, t = pred.astype(bool), tgt.astype(bool)
        assert tp == np.sum(p & t)
        assert tn == np.sum(~p & ~t)
        assert fp == np.sum(p & ~t)
        assert fn == np.sum(~p & t)
        assert n == pred.size

    def test_masked_counts(self):
        pred = _random_binary((40,))
        tgt = _random_binary((40,))
        mask = _random_binary((40,), p=0.5).astype(bool)
        tp, tn, fp, fn, n = [np.asarray(v) for v in metrics.confusion_counts(pred, tgt, mask)]
        p, t = pred.astype(bool)[mask], tgt.astype(bool)[mask]
        assert tp == np.sum(p & t) and n == mask.sum()
        assert fn == np.sum(~p & t)


class TestDice:
    def test_dice_formula(self):
        pred = _random_binary((30, 30))
        tgt = _random_binary((30, 30))
        p, t = pred.astype(bool), tgt.astype(bool)
        expected = 2 * np.sum(p & t) / (2 * np.sum(p & t) + np.sum(p & ~t) + np.sum(~p & t))
        np.testing.assert_allclose(np.asarray(metrics.dice(pred, tgt)), expected, rtol=1e-6)

    def test_perfect_and_disjoint(self):
        a = np.ones((5, 5), np.uint8)
        assert np.asarray(metrics.dice(a, a)) == 1.0
        b = np.zeros((5, 5), np.uint8)
        assert np.asarray(metrics.dice(a, b)) == 0.0

    def test_accuracy(self):
        pred = _random_binary((50,))
        tgt = _random_binary((50,))
        np.testing.assert_allclose(
            np.asarray(metrics.accuracy(pred, tgt)), np.mean(pred == tgt), rtol=1e-6)


class TestSmoothDice:
    def test_matches_reference_formula(self):
        probs = RNG.rand(4, 8, 8).astype(np.float32)
        tgt = _random_binary((4, 8, 8)).astype(np.float32)
        iflat, tflat = probs.reshape(-1), tgt.reshape(-1)
        expected = (2 * (iflat * tflat).sum() + 1.0) / (iflat.sum() + tflat.sum() + 1.0)
        np.testing.assert_allclose(np.asarray(metrics.smooth_dice(probs, tgt)), expected, rtol=1e-5)


class TestNll:
    def test_matches_manual(self):
        probs = RNG.rand(20, 2).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        tgt = RNG.randint(0, 2, (20,))
        expected = -np.mean(np.log(probs[np.arange(20), tgt]))
        np.testing.assert_allclose(np.asarray(metrics.nll(probs, tgt)), expected, rtol=1e-5)

    def test_log_input_mode(self):
        rng = np.random.RandomState(42)
        probs = rng.rand(10, 3).astype(np.float32) + 0.1
        probs /= probs.sum(-1, keepdims=True)
        tgt = rng.randint(0, 3, (10,))
        a = np.asarray(metrics.nll(probs, tgt, do_log=True))
        b = np.asarray(metrics.nll(np.log(probs).astype(np.float32), tgt, do_log=False))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestLogLoss:
    def test_matches_sklearn_two_class(self):
        probs = RNG.rand(200, 2).astype(np.float64)
        probs /= probs.sum(-1, keepdims=True)
        tgt = RNG.randint(0, 2, (200,))
        expected = skm.log_loss(tgt, probs, labels=[0, 1])
        np.testing.assert_allclose(np.asarray(metrics.log_loss(probs, tgt)), expected, rtol=1e-4)

    def test_mode_dispatch_is_shape_robust(self):
        """Multiclass vs foreground-map mode is decided by total element
        count, so (nb_classes, nb_classes) probs with nb_classes samples
        (coincidentally equal last dims) still take the multiclass branch,
        and the flattened (N, C)-vs-volume-target caller pattern works."""
        probs = np.array([[0.9, 0.1], [0.2, 0.8]], np.float64)
        tgt = np.array([0, 1])
        expected = skm.log_loss(tgt, probs, labels=[0, 1])
        np.testing.assert_allclose(np.asarray(metrics.log_loss(probs, tgt)),
                                   expected, rtol=1e-4)
        # (N, C) probs against a (z, y, x) target volume (strategies.py path)
        vol_tgt = RNG.randint(0, 2, (2, 3, 4))
        vol_probs = RNG.rand(24, 2)
        vol_probs /= vol_probs.sum(-1, keepdims=True)
        expected = skm.log_loss(vol_tgt.reshape(-1), vol_probs, labels=[0, 1])
        np.testing.assert_allclose(
            np.asarray(metrics.log_loss(vol_probs, vol_tgt)), expected,
            rtol=1e-4)
        # foreground map: same shape as the target
        fg = vol_probs[:, 1].reshape(2, 3, 4)
        expected = skm.log_loss(vol_tgt.reshape(-1), fg.reshape(-1),
                                labels=[0, 1])
        np.testing.assert_allclose(np.asarray(metrics.log_loss(fg, vol_tgt)),
                                   expected, rtol=1e-4)
        # inconsistent shapes fail loudly
        import pytest
        with pytest.raises(ValueError, match="log_loss shapes"):
            metrics.log_loss(RNG.rand(10, 2), np.zeros(7, np.int32))


class TestEntropy:
    def test_matches_scipy_convention(self):
        rng = np.random.RandomState(23)
        p = rng.rand(11, 2).astype(np.float32)
        p /= p.sum(-1, keepdims=True)
        expected = -np.where(p > 0, p * np.log(p), 0.0).sum(-1)
        np.testing.assert_allclose(np.asarray(metrics.entropy(p)), expected,
                                   rtol=1e-4, atol=1e-6)

    def test_zero_prob_convention(self):
        p = np.array([[0.0, 1.0], [0.5, 0.5]], np.float32)
        out = np.asarray(metrics.entropy(p))
        np.testing.assert_allclose(out, [0.0, np.log(2)], atol=1e-7)
