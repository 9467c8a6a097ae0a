"""Golden tests for the uncertainty decomposition / correction analysis."""
import numpy as np

from rcu_tpu.ops import uncertainty as unc

RNG = np.random.RandomState(11)


def oracle_uncertainty(prediction, target, thresholded, mask=None):
    if mask is not None:
        prediction, target, thresholded = prediction[mask], target[mask], thresholded[mask]
    tps = np.logical_and(target, prediction)
    tns = np.logical_and(~target, ~prediction)
    fps = np.logical_and(~target, prediction)
    fns = np.logical_and(target, ~prediction)
    return (tps.sum(), tns.sum(), fps.sum(), fns.sum(),
            np.logical_and(tps, thresholded).sum(), np.logical_and(tns, thresholded).sum(),
            np.logical_and(fps, thresholded).sum(), np.logical_and(fns, thresholded).sum())


def oracle_correction(prediction, target, uncertainty, threshold):
    """Literal re-derivation of reference eval.py:176-226 in numpy."""
    p = prediction.astype(bool)
    t = target.astype(bool)
    thr = uncertainty > threshold
    tp, tn, fp, fn, tpu, tnu, fpu, fnu = oracle_uncertainty(p, t, thr)
    res = dict(tpu=tpu, tnu=tnu, fpu=fpu, fnu=fnu, tp=tp, tn=tn, fp=fp, fn=fn)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = tpu / fpu if fpu else (np.inf if tpu else np.nan)
        jaccard = tp / (tp + fp + fn)
        res["dice_benefit"] = bool(ratio < jaccard)
        res["accuracy_benefit"] = bool(ratio < 1)

        def _dice(a, b):
            aa, bb = a.astype(bool), b.astype(bool)
            return 2 * np.sum(aa & bb) / (2 * np.sum(aa & bb) + np.sum(aa & ~bb) + np.sum(~aa & bb))

        res["dice"] = _dice(p, t)
        res["accuracy"] = np.mean(p == t)
        corr = p.copy()
        corr[thr] = 0
        res["corrected_dice"] = _dice(corr, t)
        res["corrected_accuracy"] = np.mean(corr == t)
        res["dice_benefit_correct"] = (res["corrected_dice"] > res["dice"]) == res["dice_benefit"]
        res["accuracy_benefit_correct"] = \
            (res["corrected_accuracy"] > res["accuracy"]) == res["accuracy_benefit"]
        corr = p.copy()
        corr[thr] = 1
        res["corrected_add_dice"] = _dice(corr, t)
        res["corrected_add_accuracy"] = np.mean(corr == t)
    return res


class TestUncertaintyCounts:
    def test_matches_oracle(self):
        p = RNG.rand(31, 17) < 0.4
        t = RNG.rand(31, 17) < 0.4
        u = RNG.rand(31, 17) < 0.3
        got = [float(v) for v in unc.uncertainty_counts(p, t, u)]
        expected = oracle_uncertainty(p, t, u)
        np.testing.assert_allclose(got, expected)

    def test_masked(self):
        p = RNG.rand(200) < 0.4
        t = RNG.rand(200) < 0.4
        u = RNG.rand(200) < 0.3
        m = RNG.rand(200) < 0.5
        got = [float(v) for v in unc.uncertainty_counts(p, t, u, m)]
        np.testing.assert_allclose(got, oracle_uncertainty(p, t, u, m))


class TestErrorMetricConventions:
    def test_zero_over_zero_is_one(self):
        one = np.float32(1.0)
        assert float(unc.error_dice(0., 0., 0., 0., 0., 0.)) == one
        assert float(unc.error_recall(0., 0., 0., 0.)) == one
        assert float(unc.error_precision(0., 0., 0., 0.)) == one

    def test_regular_values(self):
        # fp=2 fn=1 tpu=3 tnu=4 fpu=1 fnu=1
        np.testing.assert_allclose(
            float(unc.error_dice(2., 1., 3., 4., 1., 1.)), (2 * 2) / (1 + 2 + 1 + 1 + 4 + 3))
        np.testing.assert_allclose(float(unc.error_recall(2., 1., 1., 1.)), 2 / 3)
        np.testing.assert_allclose(float(unc.error_precision(3., 4., 1., 1.)), 2 / 9)


class TestCorrectionEval:
    def test_matches_oracle_all_entries(self):
        p = (RNG.rand(24, 24, 6) < 0.35)
        t = (RNG.rand(24, 24, 6) < 0.35)
        u = RNG.rand(24, 24, 6).astype(np.float32)
        thresholds = [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
        out = unc.correction_eval(p, t, u, np.asarray(thresholds))
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, th in enumerate(thresholds):
            expected = oracle_correction(p, t, u, th)
            for key, val in expected.items():
                got = out[key][i]
                if isinstance(val, (bool, np.bool_)):
                    assert bool(got) == bool(val), (key, th)
                else:
                    np.testing.assert_allclose(got, val, rtol=1e-5, atol=1e-6,
                                               err_msg=f"{key}@{th}")

    def test_error_metrics_vector(self):
        p = RNG.rand(500) < 0.4
        t = RNG.rand(500) < 0.4
        u = RNG.rand(500).astype(np.float32)
        ths = np.asarray([0.1, 0.5, 0.9])
        out = unc.uncertainty_error_metrics(p, t, u, ths)
        from tests.test_ops_uncertainty import oracle_uncertainty as ou  # self-import ok
        for i, th in enumerate(ths):
            tp, tn, fp, fn, tpu, tnu, fpu, fnu = ou(p, t, u > th)
            np.testing.assert_allclose(np.asarray(out["recall"])[i],
                                       1.0 if (fnu + fpu) == 0 and (fn + fp) == 0
                                       else (fnu + fpu) / (fn + fp), rtol=1e-5)


class TestPrepare:
    def test_fg_prob_folding(self):
        from rcu_tpu.ops import prepare
        u = RNG.rand(50).astype(np.float32)
        pred = (RNG.rand(50) < 0.5).astype(np.uint8)
        got = np.asarray(prepare.uncertainty_to_foreground_probabilities(u, pred))
        expected = u * 0.5
        expected[pred == 1] = 1 - expected[pred == 1]
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_rescale_linear_range(self):
        from rcu_tpu.ops import prepare
        x = RNG.randn(100).astype(np.float32) * 5
        got = np.asarray(prepare.rescale_subject_min_max(x))
        np.testing.assert_allclose(got.min(), 1e-5, atol=1e-7)
        np.testing.assert_allclose(got.max(), 1 - 1e-5, atol=1e-7)

    def test_add_background(self):
        from rcu_tpu.ops import prepare
        pr = RNG.rand(7, 9).astype(np.float32)
        got = np.asarray(prepare.add_background_probability(pr))
        assert got.shape == (7, 9, 2)
        np.testing.assert_allclose(got[..., 0], 1 - pr, rtol=1e-6)
        np.testing.assert_allclose(got[..., 1], pr, rtol=1e-6)

    def test_normalized_entropy(self):
        from rcu_tpu.ops import prepare
        fg = RNG.rand(64).astype(np.float32)
        p2 = np.stack([1 - fg, fg], -1)
        got = np.asarray(prepare.normalized_entropy(p2))
        expected = -np.where(p2 > 0, p2 * np.log(p2), 0.0).sum(-1) / np.log(2)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


class TestLosses:
    def test_cross_entropy_matches_torch_formula(self):
        from rcu_tpu.ops import losses
        logits = RNG.randn(8, 5, 5, 2).astype(np.float32)
        tgt = RNG.randint(0, 2, (8, 5, 5))
        e = np.exp(logits - logits.max(-1, keepdims=True))
        sm = e / e.sum(-1, keepdims=True)
        expected = -np.mean(np.log(np.take_along_axis(sm, tgt[..., None], -1)))
        np.testing.assert_allclose(np.asarray(losses.cross_entropy(logits, tgt)),
                                   expected, rtol=1e-5)

    def test_aleatoric_loss_zero_sigma_reduces_to_ce(self):
        import jax
        from rcu_tpu.ops import losses
        logits = RNG.randn(4, 6, 6, 2).astype(np.float32)
        tgt = RNG.randint(0, 2, (4, 6, 6))
        sigma = np.zeros_like(logits)
        got = np.asarray(losses.aleatoric_loss(
            jax.random.PRNGKey(0), logits, sigma, tgt, is_log_sigma=False))
        expected = np.asarray(losses.cross_entropy(logits, tgt))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_aleatoric_log_sigma_mode(self):
        import jax
        from rcu_tpu.ops import losses
        logits = RNG.randn(2, 4, 4, 2).astype(np.float32)
        tgt = RNG.randint(0, 2, (2, 4, 4))
        log_sigma = np.full_like(logits, -20.0)  # exp(-20) ~ 0
        got = np.asarray(losses.aleatoric_loss(
            jax.random.PRNGKey(1), logits, log_sigma, tgt, is_log_sigma=True))
        expected = np.asarray(losses.cross_entropy(logits, tgt))
        np.testing.assert_allclose(got, expected, rtol=1e-4)
