"""Pin the direct-driver host-side fast paths against their device-side
originals.

The round-4 driver optimizations replace tiny per-dispatch device programs
with host computation (they cost a tunnel round trip each on remote TPU —
see rcu_tpu/eval/direct.py):

1. host-side f32 -> bf16 input cast in the loader threads must be
   bit-identical to the model's own on-device ``x.astype(dtype)`` first op
   (both are round-to-nearest-even), or bf16 parity
   (tests/test_bf16_parity.py) would silently drift with the upload path;
2. ``_host_fold_keys`` (vmapped threefry fold_in on the CPU backend) must
   equal per-index ``jax.random.fold_in`` on the default backend — threefry
   bits are backend-invariant by construction.
"""
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcu_tpu.eval.direct import _host_fold_keys


def test_host_bf16_cast_matches_device_astype():
    rng = np.random.RandomState(0)
    # exercise rounding in both tails and around powers of two
    x = np.concatenate([
        rng.randn(4096).astype(np.float32) * 1e3,
        rng.randn(4096).astype(np.float32) * 1e-3,
        np.float32([0.0, -0.0, 1.0, np.nextafter(np.float32(1.0),
                                                 np.float32(2.0))]),
    ])
    host = x.astype(jnp.bfloat16)
    device = np.asarray(jnp.asarray(x).astype(jnp.bfloat16))
    assert host.dtype == device.dtype
    np.testing.assert_array_equal(host.view(np.uint16),
                                  device.view(np.uint16))


def test_host_fold_keys_match_device_fold_in():
    seed, n = 42, 17
    keys = _host_fold_keys(seed, n)
    assert keys.shape == (n, 2) and keys.dtype == np.uint32
    rng = jax.random.PRNGKey(seed)
    for i in range(n):
        np.testing.assert_array_equal(
            keys[i], np.asarray(jax.random.fold_in(rng, i)))


def test_host_fold_keys_feed_jitted_programs():
    """A raw uint32 (2,) row must behave exactly like a live key object
    inside jit (old-style keys are plain arrays)."""
    keys = _host_fold_keys(7, 3)

    @jax.jit
    def draw(key):
        return jax.random.normal(key, (4,))

    live = jax.random.fold_in(jax.random.PRNGKey(7), 1)
    np.testing.assert_array_equal(np.asarray(draw(keys[1])),
                                  np.asarray(draw(live)))


def test_nonfinite_ece_completes_run_then_fails(tmp_path):
    """One degenerate subject (constant confidence map or empty eval mask
    -> NaN ECE) must neither silently pass NOR abort the run mid-flight:
    every subject's CSV rows are written, then finish() raises naming the
    affected subjects."""
    from rcu_tpu.eval.direct import DEFAULT_THRESHOLDS, _EvalSinks
    from tests.test_analysis_parity import _make_row

    rng = np.random.RandomState(0)
    sinks = _EvalSinks(str(tmp_path), "run", "", DEFAULT_THRESHOLDS,
                       "probabilities", layout="eval_tree", masked=False)
    good = _make_row(rng, 0, 0)
    bad = dict(_make_row(rng, 0, 1), ece=float("nan"))
    sinks.write_subject("subj_good", lambda k: good[k])
    sinks.write_subject("subj_bad", lambda k: bad[k])
    with pytest.raises(ValueError, match="subj_bad"):
        sinks.finish()
    csvs = list(pathlib.Path(tmp_path).rglob("*.csv"))
    assert csvs, "finish() must write the CSVs before raising"
    joined = "\n".join(p.read_text() for p in csvs)
    assert "subj_good" in joined and "subj_bad" in joined
