"""TPU-native 2D U-Net + PostNet in flax (NHWC layout).

Structural parity target: reference ``common/model/unet.py:8-186`` and
``common/model/postnet.py:6-17``. Differences are layout/idiom only:

- NHWC instead of NCHW (TPU conv layout; channels ride the 128-lane dim);
- channel dropout (torch ``Dropout2d``) is ``nn.Dropout(broadcast_dims=(1,2))``
  so the mask is shared over H/W exactly like the reference's per-channel drop;
- the MC-dropout switch (reference ``common/utils/torchhelper.py:44-50`` flips
  only dropout submodules to train mode) is the explicit ``mc_dropout`` flag:
  dropout samples while batch-norm keeps running averages;
- ``provide_features``/``sigma_out`` become a structured ``UNetOutput`` return
  value instead of module state (pure functions — no ``self.features``).

Dropout placement rules (``_get_dropout_mode``/``_get_dropout``, reference
``common/model/unet.py:63-82``) are replicated verbatim in semantics:
``dropout_center=c`` puts dropout only on the *last* conv of the ``c``
innermost down blocks and the *first* conv of the ``c`` innermost up blocks;
the bottom block gets none; without ``dropout_center`` every conv has dropout.
The classification/sigma heads always carry dropout (reference ``unet.py:160-163``).
"""
from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == variance_scaling
# with scale 1/3, fan_in, uniform. Keeps init-scale parity with the reference.
conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class UNetOutput(typing.NamedTuple):
    logits: jnp.ndarray
    sigma: jnp.ndarray | None = None
    features: jnp.ndarray | None = None


def _sow_absmax(module: nn.Module, leaf: str, x) -> None:
    """Record a conv site's input absmax into the ``quant_stats`` collection
    during an int8 calibration pass (``ops/quant.calibrate_scales``). A
    no-op — nothing traced — on every other apply/init."""
    from rcu_tpu.ops.quant import QUANT_COLLECTION
    if module.is_mutable_collection(QUANT_COLLECTION) \
            and not module.is_initializing():
        module.sow(QUANT_COLLECTION, leaf,
                   jnp.max(jnp.abs(x)).astype(jnp.float32),
                   reduce_fn=jnp.maximum,
                   init_fn=lambda: jnp.zeros((), jnp.float32))


def _sow_clip(module: nn.Module, leaf: str, x, scale) -> None:
    """Debug diagnostic for calibration/eval distribution shift: record the
    site's int8 clipped fraction (``ops/quant.clipped_fraction``) into the
    ``quant_clip`` collection. Applied with the collection mutable
    (``mutable=["quant_clip"]``) it surfaces eval batches hotter than the
    calibration batches + margin; on a normal apply the sow is a no-op and
    the stat DCEs out of the compiled program."""
    from rcu_tpu.ops.quant import CLIP_COLLECTION, clipped_fraction
    if scale is not None and module.is_mutable_collection(CLIP_COLLECTION) \
            and not module.is_initializing():
        module.sow(CLIP_COLLECTION, leaf, clipped_fraction(x, scale),
                   reduce_fn=jnp.maximum,
                   init_fn=lambda: jnp.zeros((), jnp.float32))


def _site_scale(module: nn.Module, leaf: str):
    """This conv site's calibrated activation scale (a host float, baked
    into the program as a constant), or None when the model is unquantized.
    A missing key fails loudly: it means the calibration pass ran a
    DIFFERENT decoder topology than this model (the split/fused flags must
    match between the calibration model and the quantized model)."""
    scales = module.quant_scales
    if scales is None:
        return None
    from rcu_tpu.ops.quant import site_key
    key = site_key(module.path, leaf)
    if key not in scales:
        raise KeyError(
            f"no calibrated scale for conv site '{key}' — calibrate with "
            f"the same model flags (fast decoder, dtype) as the quantized "
            f"model (have: {sorted(scales)[:4]}...)")
    return scales[key]


class _SplitInputConv(nn.Module):
    """A conv over the concatenation of two tensors, computed WITHOUT
    materializing the concat: ``conv(concat(a, b)) == conv_a(a) + conv_b(b)``
    with the kernel split along its input-channel axis.

    Param tree (``kernel``/``bias``, shapes, init) is IDENTICAL to the
    ``nn.Conv`` that would consume the concatenated input, so a module named
    like that conv is checkpoint-compatible with it — the split is a pure
    runtime rewrite. Motivation: the U-Net decoder's skip concats are
    unfused HBM writes of 2x-wide activations between up-path and conv
    (scripts/conv_stack_attribution.py names inter-op boundaries as the
    whole-forward gap vs the sum of parts). Accumulation order differs from
    the fused conv (two partial sums added), so results match to conv
    accumulation precision, not bitwise."""
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: typing.Any = None
    # BN-folded site (ConvBnRelu.fold_bn): the bias carries the BN centering
    # term (-mean*mul) whose compute-dtype rounding is an ABSOLUTE error on
    # the centered output — add it in f32 and round once, like flax BN's
    # final cast. The bias stays f32 in HBM (precast_params skips it).
    f32_bias: bool = False

    @nn.compact
    def __call__(self, a, b, a_scale: float = None, b_scale: float = None):
        in_total = a.shape[-1] + b.shape[-1]
        kernel = self.param(
            "kernel", conv_init,
            (self.kernel, self.kernel, in_total, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if a_scale is not None:
            # int8 PTQ path (ops/quant.py): the two kernel halves quantize
            # per-output-channel SEPARATELY (each half gets its own scale
            # headroom), the two int8 convs dequantize with their own
            # input-scale x weight-scale products, then add — the same
            # split identity, on the MXU's 2x int8 mode
            from rcu_tpu.ops import quant as quant_ops
            compute = self.dtype or jnp.float32
            ka, sa = quant_ops.quantize_weight(kernel[:, :, :a.shape[-1]])
            kb, sb = quant_ops.quantize_weight(kernel[:, :, a.shape[-1]:])
            ya = quant_ops.int8_conv(
                quant_ops.quantize_activation(a, a_scale), ka, self.padding)
            yb = quant_ops.int8_conv(
                quant_ops.quantize_activation(b, b_scale), kb, self.padding)
            if self.f32_bias:
                return _compensated_bias_add(
                    ya.astype(compute) * (sa * a_scale).astype(compute)
                    + yb.astype(compute) * (sb * b_scale).astype(compute),
                    bias)
            return (ya.astype(compute) * (sa * a_scale).astype(compute)
                    + yb.astype(compute) * (sb * b_scale).astype(compute)
                    + bias.astype(compute))
        if self.f32_bias:
            a, b, kernel = nn.dtypes.promote_dtype(a, b, kernel,
                                                   dtype=self.dtype)
        else:
            a, b, kernel, bias = nn.dtypes.promote_dtype(
                a, b, kernel, bias, dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            a.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(self.padding, self.padding)] * 2
        ya = jax.lax.conv_general_dilated(
            a, kernel[:, :, :a.shape[-1]], (1, 1), pad, dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            b, kernel[:, :, a.shape[-1]:], (1, 1), pad, dimension_numbers=dn)
        if self.f32_bias:
            return _compensated_bias_add(ya + yb, bias)
        return ya + yb + bias


class _QuantConv(nn.Module):
    """int8 PTQ conv site: quantize the input with the site's calibrated
    scale, run the conv as int8 x int8 -> int32 on the MXU (~2x the bf16
    rate, measured round 4), dequantize into the compute dtype. Param tree
    (``kernel``/``bias``) is IDENTICAL to the ``nn.Conv``/``_UpsampleConv``
    it replaces, so any checkpoint loads; weights quantize per-output-
    channel at trace time (``ops/quant.quantize_weight``).

    ``fold_upsample=True`` additionally folds the nearest-2x upsample into
    the (then 4x4, lhs-dilated) kernel exactly like :class:`_UpsampleConv`
    — fold first in f32, then quantize the folded kernel."""
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: typing.Any = None
    fold_upsample: bool = False
    # BN-folded site: f32 dequant + f32 bias add, one rounding to the
    # compute dtype (see _SplitInputConv.f32_bias)
    f32_bias: bool = False

    @nn.compact
    def __call__(self, x, a_scale: float = 1.0):
        from rcu_tpu.ops import quant as quant_ops
        kernel = self.param(
            "kernel", conv_init,
            (self.kernel, self.kernel, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        kf = kernel.astype(jnp.float32)
        pad, lhs_dilation = self.padding, None
        if self.fold_upsample:
            fold = jnp.asarray(_UPSAMPLE_FOLD, jnp.float32)
            kf = jnp.einsum("ai,bj,ijco->abco", fold, fold, kf)
            pad, lhs_dilation = 2, (2, 2)
        k_q, w_scale = quant_ops.quantize_weight(kf)
        x_q = quant_ops.quantize_activation(x, a_scale)
        y = quant_ops.int8_conv(x_q, k_q, pad, lhs_dilation)
        compute = self.dtype or jnp.float32
        if self.f32_bias:
            return _compensated_bias_add(
                y.astype(compute) * (w_scale * a_scale).astype(compute),
                bias)
        return y.astype(compute) * (w_scale * a_scale).astype(compute) \
            + bias.astype(compute)


class _UpsampleConv(nn.Module):
    """``conv3x3(nearest_up_2x(x))`` with the upsample folded into the conv
    (:func:`_fused_upsample_conv`). Param tree (``kernel``/``bias``, shapes,
    init) is identical to the plain ``nn.Conv`` up-conv it replaces, so a
    module under the same name is checkpoint-compatible with it."""
    features: int
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", conv_init,
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return _fused_upsample_conv(x, kernel, bias, self.dtype)


def _compensated_bias_add(y, bias):
    """``y + bias`` with the f32 bias's precision but a compute-dtype
    elementwise chain: ``(y + hi) + lo`` where ``hi = bf16(bias)`` and
    ``lo = bf16(bias - hi)`` (two-term/Kahan split). The BN-folded bias
    carries the centering term ``-mean*mul``, so rounding it to bf16 in ONE
    term is an ABSOLUTE error on the centered activations (measured 3-10x
    the confidence-protocol gate); the lo term restores it to within ~1 ulp
    of the centered value. An f32 epilogue does the same but measured ~6%
    slower on the aux-feat leg (the f32 cast re-enters the f32-elementwise
    regime the fold exists to avoid); the two adds stay fused bf16. f32
    models take the plain add (lo would be zero)."""
    if y.dtype == jnp.float32:
        return y + bias
    hi = bias.astype(y.dtype)
    lo = (bias - hi.astype(jnp.float32)).astype(y.dtype)
    return (y + hi) + lo


class _FoldedConv(nn.Module):
    """The plain conv of a BN-folded ConvBnRelu site: compute-dtype conv,
    then the f32 bias — which carries the BN centering term ``-mean*mul``
    (models/unet.fold_bn_params) — added in f32 with ONE rounding back to
    the compute dtype, exactly flax BatchNorm's final-cast error structure.
    Rounding that bias to bf16 instead puts an ABSOLUTE error on the
    centered activations (measured 3-10x the 1e-3 confidence-protocol gate).
    Param tree (``kernel``/``bias``) is identical to the ``nn.Conv`` it
    replaces."""
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: typing.Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", conv_init,
            (self.kernel, self.kernel, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(self.padding, self.padding)] * 2,
            dimension_numbers=dn)
        return _compensated_bias_add(y, bias)


class ConvBnRelu(nn.Module):
    """conv -> [channel dropout] -> [batch norm] -> [relu] (reference unet.py:8-23).

    ``dtype`` is the compute dtype (bf16 rides the MXU at full rate); params
    and BatchNorm statistics stay float32 (flax param_dtype default).

    ``x`` may be a PAIR ``(a, b)`` meaning "the concatenation of a and b":
    the conv is then computed concat-free via :class:`_SplitInputConv` under
    the same param name, keeping checkpoints interchangeable."""
    out_ch: int
    dropout: float | None = None
    bn: bool = True
    activation: bool = True
    kernel: int = 3
    padding: int = 1
    dtype: typing.Any = None
    # int8 PTQ: {site_key: activation scale} dict (ops/quant.py) — None runs
    # the plain conv. The dropout/BN/relu epilogue below is SHARED by both
    # paths (identical module paths -> identical flax RNG folding).
    quant_scales: typing.Any = None
    # deterministic-inference BN fold (models/unet.fold_bn_params): the BN
    # was already folded into this conv's kernel/bias at LOAD time, so the
    # BN op — whose f32 running stats promote the whole activation to f32
    # inside flax's _normalize, the measured single-forward bf16 binder —
    # is skipped. Only valid when dropout is inactive (conv->dropout->BN
    # order: a dropped channel must still receive the BN shift); the model
    # owners guard train/mc_dropout.
    fold_bn: bool = False

    @property
    def _folded(self) -> bool:
        """This site's BN was folded into its conv at load time — use the
        f32-bias conv variants (the bias carries the BN centering term)."""
        return self.fold_bn and self.bn

    @nn.compact
    def __call__(self, x, *, train: bool, mc_dropout: bool = False):
        if isinstance(x, tuple):
            a, b = x
            _sow_absmax(self, "Conv_0_in_absmax_a", a)
            _sow_absmax(self, "Conv_0_in_absmax_b", b)
            a_scale = _site_scale(self, "Conv_0_in_absmax_a")
            b_scale = _site_scale(self, "Conv_0_in_absmax_b")
            _sow_clip(self, "Conv_0_in_absmax_a", a, a_scale)
            _sow_clip(self, "Conv_0_in_absmax_b", b, b_scale)
            x = _SplitInputConv(self.out_ch, self.kernel, self.padding,
                                dtype=self.dtype, name="Conv_0",
                                f32_bias=self._folded)(
                a, b, a_scale=a_scale, b_scale=b_scale)
        else:
            _sow_absmax(self, "Conv_0_in_absmax", x)
            scale = _site_scale(self, "Conv_0_in_absmax")
            _sow_clip(self, "Conv_0_in_absmax", x, scale)
            if scale is not None:
                x = _QuantConv(self.out_ch, self.kernel, self.padding,
                               dtype=self.dtype, name="Conv_0",
                               f32_bias=self._folded)(
                    x, a_scale=scale)
            elif self._folded:
                x = _FoldedConv(self.out_ch, self.kernel, self.padding,
                                dtype=self.dtype, name="Conv_0")(x)
            else:
                x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                            padding=self.padding, kernel_init=conv_init,
                            dtype=self.dtype)(x)
        # policy-remat tag: under make_train_step(remat='conv') the bwd pass
        # SAVES conv outputs and recomputes the fused dropout/BN/relu
        # epilogue. A lowering-time no-op on every other path.
        x = checkpoint_name(x, "conv_out")
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not (train or mc_dropout))(x)
        if self.bn and not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _conv_dropout(dropout, dropout_mode, i, repetitions):
    """Which convs of a block carry dropout (reference unet.py:63-72)."""
    if dropout_mode == "all":
        return dropout
    if dropout_mode == "first" and i == 0:
        return dropout
    if dropout_mode == "last" and i == repetitions - 1:
        return dropout
    return None


def _block_dropout_mode(dropout_center, curr_depth, depth, is_down):
    """Dropout mode of a block at a given depth (reference unet.py:75-82)."""
    if dropout_center is None:
        return "all"
    if curr_depth == depth:
        return "no"
    if curr_depth + dropout_center >= depth:
        return "last" if is_down else "first"
    return "no"


class ConvBlock(nn.Module):
    """``repetitions`` stacked ConvBnRelu (reference unet.py:26-39)."""
    out_ch: int
    dropout: float | None = None
    dropout_mode: str = "all"
    bn: bool = True
    repetitions: int = 2
    dtype: typing.Any = None
    quant_scales: typing.Any = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, mc_dropout: bool = False):
        for i in range(self.repetitions):
            do = _conv_dropout(self.dropout, self.dropout_mode, i, self.repetitions)
            x = ConvBnRelu(self.out_ch, do, self.bn, dtype=self.dtype,
                           fold_bn=self.fold_bn,
                           quant_scales=self.quant_scales)(
                x, train=train, mc_dropout=mc_dropout)
        return x


class ConvResidualBlock(nn.Module):
    """Stacked convs (last without relu) + 1x1 residual (reference unet.py:42-60)."""
    out_ch: int
    dropout: float | None = None
    dropout_mode: str = "all"
    bn: bool = True
    repetitions: int = 2
    dtype: typing.Any = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, mc_dropout: bool = False):
        if isinstance(x, tuple):
            residual = _SplitInputConv(self.out_ch, kernel=1, padding=0,
                                       dtype=self.dtype, name="Conv_0")(*x)
        else:
            residual = nn.Conv(self.out_ch, (1, 1), kernel_init=conv_init,
                               dtype=self.dtype)(x)
        for i in range(self.repetitions - 1):
            do = _conv_dropout(self.dropout, self.dropout_mode, i, self.repetitions)
            x = ConvBnRelu(self.out_ch, do, self.bn, dtype=self.dtype,
                           fold_bn=self.fold_bn)(
                x, train=train, mc_dropout=mc_dropout)
        do = _conv_dropout(self.dropout, self.dropout_mode, self.repetitions - 1,
                           self.repetitions)
        x = ConvBnRelu(self.out_ch, do, self.bn, activation=False,
                       dtype=self.dtype, fold_bn=self.fold_bn)(
            x, train=train, mc_dropout=mc_dropout)
        return x + residual


def _upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample in NHWC (reference helpers.py:5-16)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# conv3x3(nearest_up_2x(x)) == conv4x4(zero_stuff_2x(x)) with the 4x4 kernel
# = the 3x3 kernel correlated with a 2x2 box (nearest_up = box2 * zero_stuff,
# so the box folds into the kernel). Rows/cols combine as k4 = A k3 A^T.
# Kept as a host (numpy) constant: a jnp.array here would initialize the
# backend — over this image's remote-TPU tunnel — at import time.
_UPSAMPLE_FOLD = np.array([[1., 0., 0.],
                           [1., 1., 0.],
                           [0., 1., 1.],
                           [0., 0., 1.]])


def _fused_upsample_conv(x, kernel, bias, dtype):
    """``conv3x3(nearest_up_2x(x)) + bias`` as ONE lhs-dilated conv: the
    2h x 2w x c upsampled activation is never written to HBM (XLA lowers
    lhs_dilation=2 to per-phase 2x2 convs, the strided-conv-gradient path).
    ``kernel``/``bias`` are the stored 3x3 up-conv params — the 4x4 fold is
    a trace-time einsum over the (3,3,ci,co) tree, so checkpoints are
    unchanged. Weight pre-summing regroups additions, so numerics match to
    accumulation precision, not bitwise (same bar as bf16)."""
    fold = _UPSAMPLE_FOLD.astype(kernel.dtype)
    k4 = jnp.einsum("ai,bj,ijco->abco", fold, fold, kernel)
    x, k4, bias = nn.dtypes.promote_dtype(x, k4, bias, dtype=dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k4.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=dn)
    return y + bias


def _pad_to(up, target_hw):
    """Pad spatially to the skip's shape: diff//2 before, rest after
    (reference unet.py:107-117 odd-size padding)."""
    h_diff = target_hw[0] - up.shape[1]
    w_diff = target_hw[1] - up.shape[2]
    if h_diff == 0 and w_diff == 0:
        return up
    return jnp.pad(up, ((0, 0),
                        (h_diff // 2, h_diff // 2 + h_diff % 2),
                        (w_diff // 2, w_diff // 2 + w_diff % 2),
                        (0, 0)))


# The production "fast decoder" bundle: the checkpoint-compatible decoder
# rewrites that every surface (direct eval, serving, benches) enables
# together. Single-sourced so adding a third flag can't silently desync one
# of the opt-in sites from what production serves.
FAST_DECODER_KWARGS = {"split_decoder_concat": True, "fused_upsample": True}


class UNet(nn.Module):
    """Configurable 2D encoder-decoder (reference unet.py:123-186).

    Call with NHWC input; returns :class:`UNetOutput`.

    Built with ``setup()`` and explicit submodule names that reproduce the
    historical ``nn.compact`` auto-names exactly (``ConvBlock_0..2d``,
    ``Conv_0..d-1`` upconvs, ``ConvBnRelu_0/1`` heads, ``Conv_d``/``Conv_d+1``
    1x1 convs), so checkpoints and torch-weight transplants are unchanged.
    The split structure exists for :meth:`encode_shared`/:meth:`decode_rest`:
    under ``dropout_center`` the leading encoder blocks carry no dropout, so
    MC-dropout inference can run them ONCE and fan out only the stochastic
    tail T times (``mc_shared_blocks``).
    """
    nb_classes: int
    in_channels: int  # kept for config/registry parity; inferred by flax convs
    depth: int = 4
    start_filters: int = 16
    dropout: float | None = 0.2
    dropout_center: int | None = None
    residual: bool = False
    sigma_out: bool = False
    provide_features: bool = False
    bn: bool = True
    dtype: typing.Any = None  # compute dtype, e.g. jnp.bfloat16 (params stay f32)
    # compute each decoder block's first conv (and, for residual blocks, the
    # 1x1 residual) concat-free via the split-kernel identity — same params,
    # same checkpoint, never writes the 2x-wide concat activation to HBM.
    # Accumulation order differs, so this is opt-in like bf16 and rides the
    # same 1e-3 parity gate (tests/test_bf16_parity.py methodology).
    split_decoder_concat: bool = False
    # fold each nearest-2x upsample into its up-conv as one lhs-dilated conv
    # (_fused_upsample_conv): the 4x-size upsampled activation never touches
    # HBM and the up-conv runs at 4/9 of the taps. Same params/checkpoints;
    # opt-in on the same accumulation-precision bar as split_decoder_concat.
    fused_upsample: bool = False
    # int8 PTQ inference (ops/quant.py): {site_key: scale} from
    # ops/quant.calibrate_scales run on the PLAIN model with the same
    # dtype/decoder flags. Quantizes every 3x3 trunk conv (down/bottom/up
    # blocks, up-convs, head ConvBnRelu_0); the 1x1 class/sigma heads keep
    # the compute-dtype path (cheap, and the sigma protocol is
    # precision-sensitive — see the bf16 notes above). Same checkpoints;
    # opt-in, envelope-gated by tests/test_quant.py.
    quant_scales: typing.Any = None
    # keep the N FINEST resolution levels (level 0 = full resolution) in the
    # compute dtype even when quant_scales is set. Measured (round 4,
    # scripts/conv_stack_attribution.py --int8): int8 is ~2x bf16 only from
    # the 60^2 level down; at the full-resolution 240^2 x 32ch level the MXU
    # int8 mode REGRESSES to ~0.6x bf16 (the output-lane binder does not
    # care about operand width, and the int8 path adds a quantize pass on
    # the largest activations), so quantizing it costs nearly half the
    # full-int8 forward. ops/quant.DEFAULT_SKIP_LEVELS carries the
    # measured-best production default.
    quant_skip_levels: int = 0
    # deterministic-inference BN fold: the checkpoint's BatchNorms were
    # folded into their preceding convs at load time
    # (models/unet.fold_bn_params), so every ConvBnRelu skips its BN op.
    # flax's BatchNorm promotes the whole activation to the f32 of its
    # running stats inside _normalize — the measured bf16 single-forward
    # binder — while the fold moves the per-channel affine into the conv's
    # MXU pass (f32 accumulate) at weight-rounding numerics. INVALID under
    # active dropout (conv->dropout->BN: a dropped channel must still get
    # the BN shift), so __call__ rejects train/mc_dropout; the MC protocols
    # keep flax BN. Opt-in, same E2E gate bar as bf16/fast_decoder
    # (tests/test_fold_bn.py).
    fold_bn: bool = False

    def _level_scales(self, level: int):
        """quant_scales for a module operating at resolution level ``level``
        (0 = finest), honoring ``quant_skip_levels``."""
        if self.quant_scales is None or level < self.quant_skip_levels:
            return None
        return self.quant_scales

    def setup(self):
        block_cls = ConvResidualBlock if self.residual else ConvBlock
        prefix = block_cls.__name__
        if self.quant_scales is not None and self.residual:
            raise NotImplementedError(
                "int8 quantization does not cover residual=True models "
                "(the 1x1 residual convs are unquantized sites); use the "
                "plain block variant")
        if not 0 <= self.quant_skip_levels <= self.depth + 1:
            raise ValueError(
                f"quant_skip_levels must be in [0, depth+1="
                f"{self.depth + 1}], got {self.quant_skip_levels}")

        def qkw(level):
            if self.residual:
                return {}
            return {"quant_scales": self._level_scales(level)}
        down, ch = [], self.start_filters
        for i in range(self.depth):
            mode = _block_dropout_mode(self.dropout_center, i, self.depth, True)
            down.append(block_cls(ch, self.dropout, mode, self.bn,
                                  dtype=self.dtype, fold_bn=self.fold_bn,
                                  name=f"{prefix}_{i}", **qkw(i)))
            ch *= 2
        self.down_blocks = tuple(down)
        mode = _block_dropout_mode(self.dropout_center, self.depth,
                                   self.depth, True)
        self.bottom_block = block_cls(ch, self.dropout, mode, self.bn,
                                      dtype=self.dtype,
                                      fold_bn=self.fold_bn,
                                      name=f"{prefix}_{self.depth}",
                                      **qkw(self.depth))
        up_convs, up_blocks = [], []
        for k in range(self.depth):
            ch //= 2
            # the k-th up-conv/up-block WRITE level depth-1-k (its output
            # resolution decides whether int8 wins — the conv's work is
            # proportional to the output grid)
            level = self.depth - 1 - k
            if self._level_scales(level) is not None:
                # int8 up-conv site; folds the upsample too when that flag
                # is on (the fastest production combination)
                up_convs.append(_QuantConv(
                    ch, kernel=3, padding=1, dtype=self.dtype,
                    fold_upsample=self.fused_upsample, name=f"Conv_{k}"))
            elif self.fused_upsample:
                up_convs.append(_UpsampleConv(ch, dtype=self.dtype,
                                              name=f"Conv_{k}"))
            else:
                up_convs.append(nn.Conv(ch, (3, 3), padding=1,
                                        kernel_init=conv_init,
                                        dtype=self.dtype, name=f"Conv_{k}"))
            mode = _block_dropout_mode(self.dropout_center, level, self.depth,
                                       False)
            up_blocks.append(block_cls(
                ch, self.dropout, mode, self.bn, dtype=self.dtype,
                fold_bn=self.fold_bn,
                name=f"{prefix}_{self.depth + 1 + k}", **qkw(level)))
        self.up_convs = tuple(up_convs)
        self.up_blocks = tuple(up_blocks)
        self.head_cbr = ConvBnRelu(self.start_filters, self.dropout, self.bn,
                                   dtype=self.dtype, name="ConvBnRelu_0",
                                   fold_bn=self.fold_bn,
                                   quant_scales=self._level_scales(0))
        # the 1x1 class conv computes in the compute dtype and casts only its
        # nb_classes-channel OUTPUT to f32: casting its start_filters-channel
        # INPUT instead materializes a 16x-wider f32 activation at full
        # resolution (~7 GB extra HBM traffic per T=20 flagship forward, ~5%
        # at the measured 635 GB/s stream — scripts/conv_stack_attribution.py
        # names the inter-op boundaries as the forward's remaining gap).
        # Parity-gated at 1e-3 by tests/test_bf16_parity.py; f32 models are
        # bit-identical either way.
        self.cls_conv = nn.Conv(self.nb_classes, (1, 1),
                                kernel_init=conv_init, dtype=self.dtype,
                                name=f"Conv_{self.depth}")
        if self.sigma_out:
            # the sigma head always computes in f32, even under a bf16 compute
            # dtype: the sigma protocol's GLOBAL min-max rescale stretches the
            # narrow predicted-class sigma range across all 10 ECE bins, so
            # bf16 relative error on the head measurably breaks the 1e-3
            # parity gate (tests/test_bf16_parity.py). A f32 head (one 3x3
            # conv at start_filters channels + the 1x1) costs a small slice of
            # the T=1 aleatoric forward while the bf16 trunk keeps the MXU
            # rate — the standard per-module mixed-precision split.
            self.sigma_cbr = ConvBnRelu(self.start_filters, self.dropout,
                                        self.bn, dtype=None,
                                        fold_bn=self.fold_bn,
                                        name="ConvBnRelu_1")
            self.sigma_conv = nn.Conv(self.nb_classes, (1, 1),
                                      kernel_init=conv_init,
                                      name=f"Conv_{self.depth + 1}")

    @property
    def mc_shared_blocks(self) -> int:
        """Leading encoder blocks that are DETERMINISTIC under MC dropout
        (dropout_center=c leaves the outer depth-c down blocks dropout-free,
        _block_dropout_mode above); 0 when every block is stochastic."""
        if self.dropout is None or not self.dropout_center:
            return 0
        return max(0, self.depth - self.dropout_center)

    def _down(self, x, skips, start: int, train: bool, mc_dropout: bool):
        """Down blocks ``start..depth-1``, appending skip tensors."""
        skips = list(skips)
        for i in range(start, self.depth):
            skip = self.down_blocks[i](x, train=train, mc_dropout=mc_dropout)
            skips.append(skip)
            x = nn.max_pool(skip, (2, 2), strides=(2, 2))
        return x, skips

    def _finish(self, x, skips, train: bool, mc_dropout: bool):
        """Bottom + decoder + heads from pooled features and all skips."""
        kw = dict(train=train, mc_dropout=mc_dropout)
        x = self.bottom_block(x, **kw)
        for k in range(self.depth):
            skip = skips[self.depth - 1 - k]
            quantized = \
                self._level_scales(self.depth - 1 - k) is not None
            if self.fused_upsample:
                # (nearest upsample preserves values, so the site's absmax
                # is the same whether sown on x or on the upsampled tensor)
                _sow_absmax(self, f"Conv_{k}_in_absmax", x)
                up_scale = _site_scale(self, f"Conv_{k}_in_absmax") \
                    if quantized else None
                _sow_clip(self, f"Conv_{k}_in_absmax", x, up_scale)
                up = self.up_convs[k](x, a_scale=up_scale) \
                    if quantized else self.up_convs[k](x)
            else:
                up = _upsample_nearest_2x(x)
                _sow_absmax(self, f"Conv_{k}_in_absmax", up)
                up_scale = _site_scale(self, f"Conv_{k}_in_absmax") \
                    if quantized else None
                _sow_clip(self, f"Conv_{k}_in_absmax", up, up_scale)
                up = self.up_convs[k](up, a_scale=up_scale) \
                    if quantized else self.up_convs[k](up)
            up = _pad_to(up, (skip.shape[1], skip.shape[2]))
            if self.split_decoder_concat:
                x = self.up_blocks[k]((up, skip), **kw)
            else:
                x = jnp.concatenate([up, skip], axis=-1)
                x = self.up_blocks[k](x, **kw)

        features = x if self.provide_features else None
        head = self.head_cbr(x, **kw)
        # heads emit float32 logits regardless of compute dtype (cast on the
        # narrow output, not the wide input — see setup())
        logits = self.cls_conv(head).astype(jnp.float32)
        sigma = None
        if self.sigma_out:
            # f32 head on the (possibly bf16) trunk features — see setup()
            sigma = self.sigma_conv(
                self.sigma_cbr(x.astype(jnp.float32), **kw))
        return UNetOutput(logits=logits, sigma=sigma, features=features)

    def _check_fold_bn(self, train: bool, mc_dropout: bool) -> None:
        if self.fold_bn and (train or mc_dropout):
            raise ValueError(
                "fold_bn is a deterministic-inference rewrite: the BN fold "
                "does not commute with an ACTIVE dropout between conv and "
                "BN (a dropped channel must still receive the BN shift) "
                "and folded models have no BN to train — run MC-dropout/"
                "training protocols on the unfolded model")

    def __call__(self, x, *, train: bool = False, mc_dropout: bool = False):
        self._check_fold_bn(train, mc_dropout)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x, skips = self._down(x, [], 0, train, mc_dropout)
        return self._finish(x, skips, train, mc_dropout)

    def encode_shared(self, x, *, train: bool = False):
        """The MC-deterministic encoder prefix (``mc_shared_blocks`` down
        blocks): run ONCE per batch, then fan :meth:`decode_rest` out over
        the T dropout samples. Returns ``(pooled, skips_tuple)``."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        split = self.mc_shared_blocks
        skips = []
        for i in range(split):
            skip = self.down_blocks[i](x, train=train, mc_dropout=False)
            skips.append(skip)
            x = nn.max_pool(skip, (2, 2), strides=(2, 2))
        return x, tuple(skips)

    def decode_rest(self, x, skips, *, train: bool = False,
                    mc_dropout: bool = False):
        self._check_fold_bn(train, mc_dropout)
        """Continue from :meth:`encode_shared`: the remaining (stochastic)
        down blocks, bottom, decoder, and heads. Module paths — and thus the
        flax dropout-rng folding — are identical to a full ``__call__``, so
        outputs match the monolithic forward bitwise."""
        x, skips = self._down(x, skips, len(skips), train, mc_dropout)
        return self._finish(x, skips, train, mc_dropout)


class PostNet(nn.Module):
    """Tiny auxiliary confidence net on U-Net features (reference postnet.py:6-17)."""
    nb_classes: int
    in_channels: int = 0  # config parity; flax infers
    nb_convs: int = 3
    dropout: float | None = None
    dtype: typing.Any = None
    fold_bn: bool = False  # see UNet.fold_bn (deterministic inference only)

    @nn.compact
    def __call__(self, x, *, train: bool = False, mc_dropout: bool = False):
        if self.fold_bn and (train or mc_dropout):
            raise ValueError(
                "fold_bn is a deterministic-inference rewrite — run "
                "MC-dropout/training protocols on the unfolded model")
        ch = x.shape[-1]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for _ in range(self.nb_convs):
            x = ConvBnRelu(ch, self.dropout, kernel=1, padding=0,
                           dtype=self.dtype, fold_bn=self.fold_bn)(
                x, train=train, mc_dropout=mc_dropout)
        # unlike UNet.cls_conv, the head stays in f32 deliberately: PostNet is
        # a tiny T=1 net (no 7-GB cast to save), and its softmax confidence
        # feeds the per-subject min-max rescale — the exact narrow-range
        # mechanism that breaks the 1e-3 gate for the bf16 sigma head
        logits = nn.Conv(self.nb_classes, (1, 1), kernel_init=conv_init)(
            x.astype(jnp.float32))
        return UNetOutput(logits=logits)


def f32_head_keys(model) -> frozenset:
    """Top-level param/batch_stats keys that must STAY f32 under a
    compute-dtype override: the modules above that deliberately compute in
    f32 (the UNet sigma head and the PostNet confidence head — their narrow
    output ranges feed global/per-subject min-max rescales that bf16
    relative error measurably breaks, see the in-class comments)."""
    if isinstance(model, UNet) and model.sigma_out:
        return frozenset({"ConvBnRelu_1", f"Conv_{model.depth + 1}"})
    if isinstance(model, PostNet):
        return frozenset({"Conv_0"})
    return frozenset()


def precast_params(model, params, batch_stats):
    """Cast float PARAM leaves of inference state to the compute dtype ONCE.

    Under a compute-dtype override, flax's ``promote_dtype`` casts the f32
    params to the compute dtype inside EVERY dispatch — redundant HBM
    traffic (read 4 B + write 2 B + re-read 2 B per param vs 2 B for a
    pre-cast read) that the one-time host-side cast hoists out of the
    program. (A cruder full-tree cast including BatchNorm measured 36.8 →
    68.2 Mvox/s on the aux-feat leg, but most of that win is BatchNorm's
    f32 promotion of the ACTIVATIONS — see ``ConvBnRelu``'s inference BN —
    and bf16 BN stats measurably break the 1e-3 confidence gates, so it
    does not ship.) Two exclusions keep the numerics EXACTLY those of the
    established on-the-fly bf16 path (whose parity gates are the opt-in's
    contract):

    - the f32-head subtrees (:func:`f32_head_keys`) stay f32 — the
      mixed-dtype sigma/confidence fixes keep their f32 weights;
    - everything BatchNorm stays f32 (``batch_stats`` wholesale AND the
      ``BatchNorm_*`` scale/bias params): flax's BatchNorm normalizes in
      f32 and casts only its OUTPUT to the compute dtype, so pre-cast bf16
      stats/scales feed a genuinely different rsqrt/multiply (measured
      0.7–1.2e-2 ECE shift through the narrow-range confidence rescale —
      breaks the 1e-3 gate). BN carries 4 vectors of C elements vs
      9·Cin·Cout per conv kernel — no traffic worth saving there.

    Conv kernels/biases ARE cast on-the-fly by flax's ``promote_dtype``
    with the same round-to-nearest-even, so programs see bit-identical
    weights and every existing bf16 parity gate keeps its meaning. f32
    models (``model.dtype is None``) pass through unchanged.
    """
    dtype = getattr(model, "dtype", None)
    if dtype is None:
        return params, batch_stats

    def _cast(x):
        return x.astype(dtype) if np.issubdtype(np.asarray(x).dtype,
                                                np.floating) else x

    keep = f32_head_keys(model)
    # BN-folded models (fold_bn_params): conv biases carry the BN centering
    # term -mean*mul and are added in a f32 epilogue (_FoldedConv /
    # f32_bias) — keep them f32 (C-sized vectors, no traffic worth saving)
    keep_bias = getattr(model, "fold_bn", False)

    def _walk(tree, top=False):
        out = {}
        for key, sub in dict(tree).items():
            if (top and key in keep) or key.startswith("BatchNorm") \
                    or (keep_bias and key == "bias"):
                out[key] = sub
            elif isinstance(sub, dict) or hasattr(sub, "items"):
                out[key] = _walk(sub)
            else:
                out[key] = _cast(sub)
        return out

    return _walk(params, top=True), batch_stats


def fold_bn_params(params, batch_stats, epsilon: float = 1e-5):
    """Fold every ConvBnRelu's BatchNorm into its conv at LOAD time, for a
    ``fold_bn=True`` inference model.

    ``relu(BN(drop(conv(x, k) + b)))`` with running stats equals
    ``relu(drop(conv(x, k * mul) + (b - mean) * mul + bias_bn))`` where
    ``mul = scale / sqrt(var + eps)`` — per-output-channel algebra done
    once on the host in f32, so the program runs one MXU conv (f32
    accumulate) with NO BatchNorm op. That removes flax BatchNorm's f32
    promotion of the whole activation (``_normalize``'s ``x - mean`` with
    f32 running stats), the measured bf16 single-forward binder. Only the
    commute with INACTIVE dropout is valid (the model guards
    train/mc_dropout); relu commutes because the folded conv emits the
    exact BN output value.

    Numerics: the fold itself is f32-exact algebra; under a bf16 compute
    dtype the one new rounding is of ``k * mul`` instead of ``k`` — the
    same weight-rounding error class the existing bf16 E2E gates pass
    (tests/test_fold_bn.py pins it end to end).

    A ConvBnRelu param dict is recognized as a dict holding both ``Conv_0``
    and ``BatchNorm_0`` (the up-convs and residual 1x1s have no sibling BN
    and pass through). Returns ``(params, batch_stats)`` with every folded
    ``BatchNorm_0`` dropped — the ``fold_bn=True`` template creates no BN
    params/stats, so the trees line up. ``bn=False`` models are a no-op."""
    def _prune(tree):
        out = {}
        for key, sub in dict(tree).items():
            if isinstance(sub, dict) or hasattr(sub, "items"):
                sub = _prune(sub)
                if sub:
                    out[key] = sub
            else:
                out[key] = sub
        return out

    def _walk(p, s):
        out_p, out_s = {}, {}
        for key, sub in dict(p).items():
            stats = dict(s).get(key, {}) if s else {}
            if not (isinstance(sub, dict) or hasattr(sub, "items")):
                out_p[key] = sub
                continue
            sub = dict(sub)
            if "BatchNorm_0" in sub and "Conv_0" in sub:
                bnp, bns = sub["BatchNorm_0"], dict(stats)["BatchNorm_0"]
                mul = (np.asarray(bnp["scale"], np.float32)
                       / np.sqrt(np.asarray(bns["var"], np.float32)
                                 + np.float32(epsilon)))
                conv = dict(sub["Conv_0"])
                conv["kernel"] = jnp.asarray(
                    np.asarray(conv["kernel"], np.float32) * mul)
                conv["bias"] = jnp.asarray(
                    (np.asarray(conv["bias"], np.float32)
                     - np.asarray(bns["mean"], np.float32)) * mul
                    + np.asarray(bnp["bias"], np.float32))
                out_p[key] = {k: (conv if k == "Conv_0" else v)
                              for k, v in sub.items() if k != "BatchNorm_0"}
                rest = {k: v for k, v in dict(stats).items()
                        if k != "BatchNorm_0"}
                if rest:
                    out_s[key] = rest
            else:
                sub_p, sub_s = _walk(sub, stats)
                out_p[key] = sub_p
                if sub_s:
                    out_s[key] = sub_s
        return out_p, out_s

    new_params, new_stats = _walk(params, batch_stats)
    return new_params, _prune(new_stats)
