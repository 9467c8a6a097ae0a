"""Mixed-precision (bf16 compute / f32 params) model tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.engine.state import create_train_state
from rcu_tpu.models import get_model, get_optimizer, precast_params

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


class TestPrecastParams:
    """models/unet.precast_params: the one-time host-side param cast that
    eval/direct._load_model_state applies under a compute-dtype override.
    Its contract is BITWISE equality with the established on-the-fly path
    (flax's promote_dtype casts f32 conv kernels with the same
    round-to-nearest-even), so every existing bf16 parity gate keeps its
    meaning — these tests pin that, plus the f32-island invariants
    (BatchNorm + sigma/confidence heads stay f32)."""

    def _init(self, model, shape, nb_feat=None):
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return x, variables["params"], variables["batch_stats"]

    def _leaf_dtypes(self, tree, prefix=""):
        out = {}
        for key, sub in dict(tree).items():
            path = f"{prefix}/{key}"
            if isinstance(sub, dict) or hasattr(sub, "items"):
                out.update(self._leaf_dtypes(sub, path))
            else:
                out[path] = np.asarray(sub).dtype
        return out

    def test_f32_model_is_identity(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4))
        x, params, stats = self._init(model, (1, 16, 16, 2))
        p2, s2 = precast_params(model, params, stats)
        assert p2 is params and s2 is stats

    def test_bitwise_equal_outputs_unet(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dtype="bfloat16"))
        x, params, stats = self._init(model, (2, 16, 16, 2))
        cast_p, cast_s = precast_params(model, params, stats)
        ref = model.apply({"params": params, "batch_stats": stats},
                          x, train=False)
        out = model.apply({"params": cast_p, "batch_stats": cast_s},
                          x, train=False)
        assert np.array_equal(np.asarray(ref.logits), np.asarray(out.logits))

    def test_bitwise_equal_outputs_sigma_and_f32_head(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, sigma_out=True,
                                       dtype="bfloat16"))
        x, params, stats = self._init(model, (2, 16, 16, 2))
        cast_p, cast_s = precast_params(model, params, stats)
        # the f32 sigma head's weights stay f32 (the mixed-dtype fix)
        head = {k: v for k, v in self._leaf_dtypes(cast_p).items()
                if k.startswith(("/ConvBnRelu_1", f"/Conv_{model.depth + 1}"))}
        assert head and all(dt == np.float32 for dt in head.values())
        ref = model.apply({"params": params, "batch_stats": stats},
                          x, train=False)
        out = model.apply({"params": cast_p, "batch_stats": cast_s},
                          x, train=False)
        assert np.array_equal(np.asarray(ref.logits), np.asarray(out.logits))
        assert np.array_equal(np.asarray(ref.sigma), np.asarray(out.sigma))

    def test_bitwise_equal_outputs_postnet(self):
        model = get_model("postnet", dict(nb_classes=2, in_channels=4,
                                          dtype="bfloat16"))
        x, params, stats = self._init(model, (2, 16, 16, 4))
        cast_p, cast_s = precast_params(model, params, stats)
        # the f32 confidence head stays f32
        head = {k: v for k, v in self._leaf_dtypes(cast_p).items()
                if k.startswith("/Conv_0")}
        assert head and all(dt == np.float32 for dt in head.values())
        ref = model.apply({"params": params, "batch_stats": stats},
                          x, train=False)
        out = model.apply({"params": cast_p, "batch_stats": cast_s},
                          x, train=False)
        assert np.array_equal(np.asarray(ref.logits), np.asarray(out.logits))

    def test_batchnorm_stays_f32_and_kernels_cast(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dtype="bfloat16"))
        _, params, stats = self._init(model, (1, 16, 16, 2))
        cast_p, cast_s = precast_params(model, params, stats)
        for path, dt in self._leaf_dtypes(cast_s).items():
            assert dt == np.float32, f"batch_stats leaf {path} was cast"
        dtypes = self._leaf_dtypes(cast_p)
        bn = {k: v for k, v in dtypes.items() if "/BatchNorm" in k}
        conv = {k: v for k, v in dtypes.items() if "/BatchNorm" not in k}
        assert bn and all(dt == np.float32 for dt in bn.values())
        assert conv and all(dt == jnp.bfloat16 for dt in conv.values())
