"""Shared-encoder MC fast path (dropout_center models): the deterministic
encoder prefix runs once, the stochastic tail fans out T times — outputs must
be BITWISE identical to T full forwards with the same keys."""
import jax
import jax.numpy as jnp
import numpy as np

from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.models import get_model


def center_model_and_vars(depth=3, dropout_center=1, hw=24, ch=3):
    model = get_model("unet", dict(nb_classes=2, in_channels=ch, depth=depth,
                                   start_filters=4, dropout=0.3,
                                   dropout_center=dropout_center))
    x = np.random.RandomState(0).rand(2, hw, hw, ch).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables, x


def full_mc_reference(model, variables, images, rng, mc_steps):
    """T monolithic forwards — the pre-fast-path formulation."""
    def one(key):
        out = model.apply(variables, images, train=False, mc_dropout=True,
                          rngs={"dropout": key})
        return jax.nn.softmax(out.logits, axis=-1)
    return jax.vmap(one)(jax.random.split(rng, mc_steps))


class TestSharedEncoderMC:
    def test_shared_block_count(self):
        model, _, _ = center_model_and_vars(depth=3, dropout_center=1)
        assert model.mc_shared_blocks == 2
        baseline = get_model("unet", dict(nb_classes=2, in_channels=3,
                                          depth=3, start_filters=4,
                                          dropout=0.3))
        assert baseline.mc_shared_blocks == 0
        no_dropout = get_model("unet", dict(nb_classes=2, in_channels=3,
                                            depth=3, start_filters=4,
                                            dropout=None, dropout_center=1))
        assert no_dropout.mc_shared_blocks == 0

    def test_mc_forward_bitwise_equal_to_full(self):
        model, variables, x = center_model_and_vars()
        rng = jax.random.PRNGKey(11)
        fast = steps_lib.mc_forward(model, variables, x, rng, 4)
        full = full_mc_reference(model, variables, x, rng, 4)
        assert jnp.array_equal(fast, full)
        # and the samples genuinely differ from one another (dropout active)
        assert not jnp.array_equal(fast[0], fast[1])

    def test_mc_predict_fn_uses_fast_path_identically(self):
        model, variables, x = center_model_and_vars()
        rng = jax.random.PRNGKey(3)
        predict = steps_lib.make_mc_predict_fn(model, 4, do_mi=True,
                                               do_var=True)
        out = predict(variables["params"], variables.get("batch_stats", {}),
                      {"images": x}, rng)
        full = full_mc_reference(model, variables, x, rng, 4)
        expected = steps_lib.multi_prediction_summary(full, True, True)
        for key in ("probabilities", "entropy", "mutual_info", "variance"):
            # predict is jitted, the reference is eager: XLA fusion shifts
            # rounding by ~1 ulp (bitwise equality of the raw MC samples is
            # asserted eagerly in test_mc_forward_bitwise_equal_to_full)
            np.testing.assert_allclose(np.asarray(out[key]),
                                       np.asarray(expected[key]),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_volume_pipeline_center_model(self):
        """The fused volume program's fast path matches per-batch full
        forwards with the fold_in(rng, batch_index) schedule."""
        from rcu_tpu.eval import pipeline
        model, variables, _ = center_model_and_vars(hw=16)
        vol, batch = 3, 2
        volume = np.random.RandomState(1).rand(4, 16, 16, 3).astype(np.float32)
        target = (np.random.RandomState(2).rand(vol, 16, 16) > 0.5).astype(np.uint8)
        mask = np.ones((vol, 16, 16), bool)
        th = np.asarray([0.5], np.float32)
        rng = jax.random.PRNGKey(9)
        fused = pipeline.make_volume_mc_eval_fn(model, 3, batch, vol)
        got = fused(variables["params"], variables.get("batch_stats", {}),
                    volume.reshape(2, batch, 16, 16, 3), target, mask, th, rng)
        fg_parts = []
        for i in range(2):
            probs = full_mc_reference(model, variables,
                                      volume[i * batch:(i + 1) * batch],
                                      jax.random.fold_in(rng, i), 3)
            fg_parts.append(jnp.mean(probs, axis=0)[..., 1])
        expected_fg = jnp.concatenate(fg_parts)[:vol]
        np.testing.assert_array_equal(np.asarray(got["fg"]),
                                      np.asarray(expected_fg))
