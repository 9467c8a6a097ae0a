"""U-Net / PostNet structural parity tests.

The analytic parameter count mirrors the reference torch architecture
(common/model/unet.py:123-186): conv k*k*cin*cout+cout, BN 2*cout (+2 buffers,
not counted as params in either framework's trainable sets... torch counts
weight+bias = 2*c as parameters; running stats are buffers. flax stores scale
+bias as params, mean/var as batch_stats. So trainable counts match 1:1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcu_tpu.models import PostNet, UNet


def conv_params(cin, cout, k):
    return k * k * cin * cout + cout


def bn_params(c):
    return 2 * c


def block_params(cin, cout, bn=True, reps=2):
    total = 0
    c = cin
    for _ in range(reps):
        total += conv_params(c, cout, 3) + (bn_params(cout) if bn else 0)
        c = cout
    return total


def unet_param_count(nb_classes, in_channels, depth, start_filters, bn=True,
                     sigma_out=False):
    total = 0
    cin, cout = in_channels, start_filters
    for _ in range(depth):
        total += block_params(cin, cout, bn)
        cin, cout = cout, cout * 2
    total += block_params(cin, cout, bn)  # bottom
    for _ in range(depth):
        cin, cout = cout, cout // 2
        total += conv_params(cin, cout, 3)       # up conv after upsample
        total += block_params(2 * cout, cout, bn)  # block on concat
    # cls head: ConvBnRelu(c,c) + 1x1 conv to classes
    total += conv_params(cout, cout, 3) + (bn_params(cout) if bn else 0)
    total += conv_params(cout, nb_classes, 1)
    if sigma_out:
        total += conv_params(cout, cout, 3) + (bn_params(cout) if bn else 0)
        total += conv_params(cout, nb_classes, 1)
    return total


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def init_unet(**kw):
    model = UNet(**kw)
    x = jnp.zeros((1, 32, 32, kw.get("in_channels", 4)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables, x


class TestParamCount:
    def test_brats_baseline_config(self):
        # config/train_brats_baseline.yaml: d4 f32 in4 cls2
        model, variables, _ = init_unet(nb_classes=2, in_channels=4, depth=4,
                                        start_filters=32, dropout=0.05)
        expected = unet_param_count(2, 4, 4, 32)
        assert n_params(variables["params"]) == expected
        assert expected == 8_646_018  # verified == torch reference param count

    def test_sigma_head_adds_params(self):
        _, v1, _ = init_unet(nb_classes=2, in_channels=4, depth=2, start_filters=8)
        _, v2, _ = init_unet(nb_classes=2, in_channels=4, depth=2, start_filters=8,
                             sigma_out=True)
        expected_delta = conv_params(8, 8, 3) + bn_params(8) + conv_params(8, 2, 1)
        assert n_params(v2["params"]) - n_params(v1["params"]) == expected_delta

    def test_postnet_param_count(self):
        model = PostNet(nb_classes=2, in_channels=32)
        v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 32)),
                       train=False)
        expected = 3 * (conv_params(32, 32, 1) + bn_params(32)) + conv_params(32, 2, 1)
        assert n_params(v["params"]) == expected


class TestForward:
    def test_output_shape(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=3,
                                        start_filters=8)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (1, 32, 32, 2)
        assert out.sigma is None and out.features is None

    def test_odd_spatial_shape(self):
        # 155x240 BraTS-like slices: odd dims must round-trip via the pad logic
        model = UNet(nb_classes=2, in_channels=4, depth=4, start_filters=4)
        x = jnp.zeros((2, 155, 241, 4))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (2, 155, 241, 2)

    def test_sigma_and_features(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, sigma_out=True,
                                        provide_features=True)
        out = model.apply(variables, x, train=False)
        assert out.sigma.shape == out.logits.shape
        assert out.features.shape == (1, 32, 32, 8)

    def test_residual_variant_runs(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, residual=True)
        out = model.apply(variables, x, train=False)
        assert out.logits.shape == (1, 32, 32, 2)


class TestDropoutSemantics:
    def _forward(self, model, variables, x, seed, **kw):
        return model.apply(variables, x, rngs={"dropout": jax.random.PRNGKey(seed)},
                           **kw)

    def test_eval_deterministic_without_mc(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, dropout=0.5)
        xr = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        a = self._forward(model, variables, xr, 0, train=False).logits
        b = self._forward(model, variables, xr, 1, train=False).logits
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_mc_dropout_stochastic(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, dropout=0.5)
        xr = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        a = self._forward(model, variables, xr, 0, train=False, mc_dropout=True).logits
        b = self._forward(model, variables, xr, 1, train=False, mc_dropout=True).logits
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_mc_dropout_does_not_touch_batch_stats(self):
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, dropout=0.5)
        xr = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        # train=False never mutates batch_stats, even with mc_dropout on
        out, mutated = model.apply(variables, xr, train=False, mc_dropout=True,
                                   rngs={"dropout": jax.random.PRNGKey(0)},
                                   mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        for x1, x2 in zip(before, after):
            np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))

    def test_dropout_center_no_dropout_outside_center(self):
        # dropout_center=0 disables dropout in every encoder/decoder block
        # (reference unet.py:75-82: i + 0 >= depth only at the bottom, which is
        # forced 'no'), but the classification head ALWAYS carries dropout
        # (reference unet.py:160). So under MC the features are deterministic
        # while the logits still sample.
        model, variables, x = init_unet(nb_classes=2, in_channels=4, depth=2,
                                        start_filters=8, dropout=0.5,
                                        dropout_center=0, provide_features=True)
        xr = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        a = self._forward(model, variables, xr, 0, train=False, mc_dropout=True)
        b = self._forward(model, variables, xr, 1, train=False, mc_dropout=True)
        np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features))
        assert not np.allclose(np.asarray(a.logits), np.asarray(b.logits))


class TestDropoutCenterPlacement:
    def test_mode_table(self):
        from rcu_tpu.models.unet import _block_dropout_mode
        # reference unet.py:75-82 semantics, depth=4, center=4
        assert _block_dropout_mode(4, 0, 4, True) == "last"
        assert _block_dropout_mode(4, 3, 4, True) == "last"
        assert _block_dropout_mode(4, 4, 4, True) == "no"       # bottom
        assert _block_dropout_mode(4, 0, 4, False) == "first"
        # center=2, depth=4: only levels 2,3 qualify
        assert _block_dropout_mode(2, 1, 4, True) == "no"
        assert _block_dropout_mode(2, 2, 4, True) == "last"
        assert _block_dropout_mode(2, 3, 4, False) == "first"
        assert _block_dropout_mode(None, 0, 4, True) == "all"


class TestSplitDecoderConcat:
    """``split_decoder_concat`` computes each decoder block's concat-consuming
    conv as split kernels (``models/unet._SplitInputConv``): identical param
    tree (checkpoint-compatible), concat-free at runtime, numerics equal to
    conv accumulation precision (not bitwise — same bar as bf16's gate)."""

    KW = dict(nb_classes=2, in_channels=4, depth=3, start_filters=8,
              dropout=0.5)

    def _models(self, **extra):
        kw = {**self.KW, **extra}
        return UNet(**kw), UNet(**kw, split_decoder_concat=True)

    def _init(self, model, x):
        return model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def test_param_trees_bit_identical(self):
        base, split = self._models()
        x = jnp.zeros((1, 32, 32, 4))
        vb, vs = self._init(base, x), self._init(split, x)
        assert (jax.tree_util.tree_structure(vb)
                == jax.tree_util.tree_structure(vs))
        for a, b in zip(jax.tree_util.tree_leaves(vb),
                        jax.tree_util.tree_leaves(vs)):
            # same param paths + shapes -> same init RNG folding -> bitwise
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def _assert_forward_parity(self, **extra):
        base, split = self._models(**extra)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        variables = self._init(base, x)  # base checkpoint drives BOTH models
        rngs = {"dropout": jax.random.PRNGKey(2)}
        a = base.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        b = split.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                                   rtol=1e-5, atol=1e-5)
        return a, b

    def test_forward_parity_plain(self):
        self._assert_forward_parity()

    def test_forward_parity_residual(self):
        self._assert_forward_parity(residual=True)

    def test_forward_parity_dropout_center(self):
        # center=2 puts dropout on the FIRST conv of the inner up blocks —
        # exactly the conv the split rewrite replaces; identical module
        # paths must fold the same dropout mask either way
        a, b = self._assert_forward_parity(dropout_center=2)
        assert not np.allclose(np.asarray(a.logits), 0.0)

    def test_sigma_head_unaffected(self):
        base, split = self._models(sigma_out=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 4))
        variables = self._init(base, x)
        a = base.apply(variables, x, train=False)
        b = split.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a.sigma), np.asarray(b.sigma),
                                   rtol=1e-5, atol=1e-5)


class TestFusedUpsample:
    """``fused_upsample`` folds nearest-2x upsample + 3x3 up-conv into one
    lhs-dilated conv (``models/unet._fused_upsample_conv``): identical param
    tree, the 4x-size upsampled activation never materializes."""

    def test_op_identity(self):
        # conv3x3(nearest_up(x)) == fused, odd and even spatial sizes
        from rcu_tpu.models.unet import (_fused_upsample_conv,
                                         _upsample_nearest_2x)
        rng = np.random.RandomState(0)
        for h, w in ((8, 8), (7, 9)):
            x = jnp.asarray(rng.randn(2, h, w, 6).astype(np.float32))
            kernel = jnp.asarray(rng.randn(3, 3, 6, 3).astype(np.float32))
            bias = jnp.asarray(rng.randn(3).astype(np.float32))
            import flax.linen as nn
            ref = nn.Conv(3, (3, 3), padding=1).apply(
                {"params": {"kernel": kernel, "bias": bias}},
                _upsample_nearest_2x(x))
            got = _fused_upsample_conv(x, kernel, bias, None)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    KW = dict(nb_classes=2, in_channels=4, depth=3, start_filters=8,
              dropout=0.5)

    def test_param_trees_bit_identical(self):
        base = UNet(**self.KW)
        fused = UNet(**self.KW, fused_upsample=True)
        x = jnp.zeros((1, 32, 32, 4))
        vb = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert (jax.tree_util.tree_structure(vb)
                == jax.tree_util.tree_structure(vf))
        for a, b in zip(jax.tree_util.tree_leaves(vb),
                        jax.tree_util.tree_leaves(vf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_parity_with_base_checkpoint(self):
        base = UNet(**self.KW)
        fused = UNet(**self.KW, fused_upsample=True)
        # odd spatial: exercises _pad_to after the fused upsample
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 31, 33, 4))
        variables = base.init({"params": jax.random.PRNGKey(0)}, x,
                              train=False)
        rngs = {"dropout": jax.random.PRNGKey(2)}
        a = base.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        b = fused.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                                   rtol=1e-4, atol=1e-4)

    def test_combined_with_split_decoder(self):
        base = UNet(**self.KW)
        both = UNet(**self.KW, fused_upsample=True, split_decoder_concat=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 4))
        variables = base.init({"params": jax.random.PRNGKey(0)}, x,
                              train=False)
        rngs = {"dropout": jax.random.PRNGKey(4)}
        a = base.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        b = both.apply(variables, x, train=False, mc_dropout=True, rngs=rngs)
        np.testing.assert_allclose(np.asarray(a.logits), np.asarray(b.logits),
                                   rtol=1e-4, atol=1e-4)
