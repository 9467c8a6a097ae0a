"""Mixed-precision (bf16 compute / f32 params) model tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.engine.state import create_train_state
from rcu_tpu.models import get_model, get_optimizer

pytestmark = pytest.mark.slow


class TestMixedPrecision:
    def _setup(self, dtype):
        params = dict(nb_classes=2, in_channels=2, depth=2, start_filters=4,
                      dropout=0.1)
        if dtype:
            params["dtype"] = dtype
        model = get_model("unet", params)
        opt = get_optimizer("adam", {"lr": 1e-3})
        state = create_train_state(model, opt, (1, 16, 16, 2),
                                   jax.random.PRNGKey(0))
        return model, opt, state

    def test_params_stay_f32(self):
        model, opt, state = self._setup("bfloat16")
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32

    def test_logits_f32_and_close_to_f32_model(self):
        model16, _, state16 = self._setup("bfloat16")
        model32, _, state32 = self._setup(None)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 2))
        out16 = model16.apply({"params": state16.params,
                               "batch_stats": state16.batch_stats}, x, train=False)
        out32 = model32.apply({"params": state32.params,
                               "batch_stats": state32.batch_stats}, x, train=False)
        assert out16.logits.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out16.logits),
                                   np.asarray(out32.logits), atol=0.15)

    def test_bf16_training_step_runs_and_learns(self):
        model, opt, state = self._setup("bfloat16")
        step = steps_lib.make_train_step(model, opt, donate=False)
        rng = np.random.RandomState(0)
        labels = np.zeros((8, 16, 16), np.uint8)
        labels[:, 4:12, 4:12] = 1
        images = rng.rand(8, 16, 16, 2).astype(np.float32) * 0.1
        images[..., 0] += labels
        batch = {"images": images, "labels": labels,
                 "valid": np.ones(8, np.float32)}
        losses = []
        for i in range(15):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32

    def test_registry_accepts_dtype_string(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dtype="bfloat16"))
        assert model.dtype == jnp.bfloat16
