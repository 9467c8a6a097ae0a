"""Randomized (seed-deterministic) fuzz of the device metric kernels against
the numpy oracles: random shapes, bin-edge-exact probabilities, random masks
and thresholds. Complements the fixed-shape parity tests with breadth."""
import numpy as np
import pytest

from rcu_tpu.ops import calibration as cal_ops
from rcu_tpu.ops import uncertainty as u_ops
from tests.test_ops_calibration import oracle_ece
from tests.test_ops_uncertainty import oracle_correction

EDGES = np.asarray([0.0, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0], np.float32)


def random_case(seed):
    rng = np.random.RandomState(seed)
    ndim = rng.randint(1, 4)
    shape = tuple(rng.randint(2, 14) for _ in range(ndim))
    probs = rng.rand(*shape).astype(np.float32)
    # salt in exact bin-edge values — the digitize edge-split semantics are
    # the part most likely to drift
    n_edges = rng.randint(0, probs.size // 2 + 1)
    flat = probs.reshape(-1)
    flat[rng.choice(probs.size, n_edges, replace=False)] = \
        rng.choice(EDGES, n_edges)
    target = (rng.rand(*shape) < rng.uniform(0.05, 0.95)).astype(np.float64)
    mask = rng.rand(*shape) < 0.8 if rng.rand() < 0.5 else None
    return rng, probs, target, mask


@pytest.mark.parametrize("seed", range(12))
def test_ece_fuzz(seed):
    _, probs, target, mask = random_case(seed)
    expected = oracle_ece(np.stack([1 - probs, probs], -1).astype(np.float64),
                          target, mask=mask)
    got = float(np.asarray(cal_ops.ece_binary(probs, target, mask=mask)))
    if np.isnan(expected):
        assert np.isnan(got)
    else:
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", range(12))
def test_correction_fuzz(seed):
    rng, probs, target, _ = random_case(seed)
    prediction = (probs > 0.5).astype(bool)
    uncertainty = rng.rand(*probs.shape).astype(np.float32)
    thresholds = np.sort(rng.uniform(0.0, 1.0, 3)).astype(np.float32)
    got = u_ops.correction_eval(prediction, target.astype(bool), uncertainty,
                                thresholds)
    for ti, threshold in enumerate(thresholds):
        expected = oracle_correction(prediction, target.astype(bool),
                                     uncertainty.astype(np.float64),
                                     float(threshold))
        for key in ("tpu", "fpu", "tnu", "fnu", "tp", "fp"):
            assert int(np.asarray(got[key])[ti]) == int(expected[key]), \
                (seed, key, threshold)
        for key in ("corrected_dice", "corrected_add_dice", "accuracy"):
            g = float(np.asarray(got[key])[ti])
            e = float(expected[key])
            if np.isnan(e):
                assert np.isnan(g), (seed, key)
            else:
                np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-7,
                                           err_msg=f"{seed}/{key}")
