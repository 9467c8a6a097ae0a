"""Tests for the EvaluationStrategy API-parity shim (ops/strategy.py)."""
import numpy as np

from rcu_tpu.ops import strategy as st

RNG = np.random.RandomState(21)


class TestStrategyProtocol:
    def test_compose_and_lambda(self):
        probs = RNG.rand(50).astype(np.float32)
        to_eval = {"probabilities": probs}
        results = {}
        st.ComposeEvaluation([
            st.LambdaEvaluation(lambda x: float(x.min()), ("probabilities",), "min"),
            st.LambdaEvaluation(lambda x: float(x.max()), ("probabilities",), "max"),
        ])(to_eval, results)
        assert results["min"] == probs.min() and results["max"] == probs.max()

    def test_dice_and_confusion(self):
        pred = (RNG.rand(30, 30) < 0.4).astype(np.uint8)
        tgt = (RNG.rand(30, 30) < 0.4).astype(np.uint8)
        results = {}
        st.ComposeEvaluation([st.Dice(), st.ConfusionMatrix()])(
            {"prediction": pred, "target": tgt}, results)
        p, t = pred.astype(bool), tgt.astype(bool)
        assert results["tp"] == int(np.sum(p & t))
        assert results["n"] == pred.size
        expected = 2 * results["tp"] / (2 * results["tp"] + results["fp"]
                                        + results["fn"])
        np.testing.assert_allclose(results["dice"], expected, rtol=1e-6)

    def test_ece_with_bins(self):
        probs = RNG.rand(500).astype(np.float32)
        tgt = (RNG.rand(500) < probs).astype(np.float32)
        results = {}
        st.EceBinary(return_bins=True)({"probabilities": probs, "target": tgt},
                                       results)
        assert "ece" in results and results["bins_count"].shape == (10,)
        assert results["bins_count"].sum() == 500

    def test_uncertainty_error_dice(self):
        pred = RNG.rand(100) < 0.4
        tgt = RNG.rand(100) < 0.4
        u = RNG.rand(100).astype(np.float32)
        results = {}
        st.UncertaintyErrorDice(0.5, result_prefix="th05")(
            {"prediction": pred, "target": tgt, "uncertainty": u}, results)
        assert {"th05_precision", "th05_recall", "th05_dice"} <= set(results)

    def test_uncertainty_error_dice_border_mask(self):
        """with_mask: a uint8 0/1 border mask must act as a LOGICAL inverse
        (`~` on raw uint8 would give 255/254 weights), and the reference's
        'target_boarder' (sic, eval.py:164) spelling is accepted alongside
        'target_border'."""
        pred = RNG.rand(100) < 0.4
        tgt = RNG.rand(100) < 0.4
        u = RNG.rand(100).astype(np.float32)
        border = (RNG.rand(100) < 0.3)
        expected = {}
        st.UncertaintyErrorDice(0.5, with_mask=True)(
            {"prediction": pred, "target": tgt, "uncertainty": u,
             "target_border": border}, expected)
        for key in ("target_border", "target_boarder"):
            got = {}
            st.UncertaintyErrorDice(0.5, with_mask=True)(
                {"prediction": pred, "target": tgt, "uncertainty": u,
                 key: border.astype(np.uint8)}, got)
            assert got == expected
        # the mask must actually exclude the border (differ from unmasked)
        unmasked = {}
        st.UncertaintyErrorDice(0.5)(
            {"prediction": pred, "target": tgt, "uncertainty": u}, unmasked)
        assert unmasked != expected

    def test_ece_threshold_range_matches_ece_binary(self):
        """EceBinary(threshold_range=...) must agree with the single-sourced
        ops.calibration.ece_binary threshold semantics."""
        from rcu_tpu.ops import calibration as cal
        probs = RNG.rand(400).astype(np.float32)
        tgt = (RNG.rand(400) < probs).astype(np.float32)
        results = {}
        st.EceBinary(threshold_range=(0.2, 0.8))(
            {"probabilities": probs, "target": tgt}, results)
        import jax.numpy as jnp
        direct = float(np.asarray(cal.ece_binary(
            jnp.asarray(probs), jnp.asarray(tgt), threshold_range=(0.2, 0.8))))
        np.testing.assert_allclose(results["ece"], direct, rtol=1e-6)

    def test_correction_eval_entries(self):
        pred = RNG.rand(100) < 0.4
        tgt = RNG.rand(100) < 0.4
        u = RNG.rand(100).astype(np.float32)
        results = {}
        st.UncertaintyAndCorrectionEval(0.5)(
            {"prediction": pred, "target": tgt, "uncertainty": u}, results)
        from rcu_tpu.eval.actions import CORRECTION_KEYS
        assert list(results.keys()) == list(CORRECTION_KEYS)
        assert isinstance(results["tpu"], int)
        assert isinstance(results["dice_benefit"], bool)
