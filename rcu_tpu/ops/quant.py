"""Post-training int8 quantization (PTQ) for the inference path.

TPU v5e executes int8 convolutions on the MXU at ~2x the bf16 rate
(measured round 4, ``scripts/bf16_gap_analysis.py --int8_peak``: 98 vs 42
TF/s at the flagship's 120^2 x 64ch level and 264 vs 154 at 60^2 x 128ch,
chained-conv microbench incl. the dequant+requant epilogue — the int8 path
is the chip's one remaining ~2x roofline lever once bf16+fast-decoder sits
at the practical MXU peak). End-to-end it lifts the MC-20 direct-eval
headline from 10.5 to 12.93 Mvox/s (+23% in ``BENCH_r05_builder2.json``
under the r5 async-window headline timing; the r4 per-volume-sync capture
``BENCH_r04.json`` read 12.7/+21%; ECE delta 4e-6) at the production
default ``DEFAULT_SKIP_LEVELS = 1``; see ``BENCH_r05_builder.json`` for
the full per-protocol matrix.

Scheme (the standard production PTQ recipe):

- **weights**: per-output-channel symmetric int8, quantized at TRACE time
  from the stored float32 params — checkpoints are unchanged and the
  quantize op (O(k^2*Cin*Cout)) is negligible next to the conv itself;
- **activations**: per-site symmetric int8 with scales from a CALIBRATION
  pass — the plain model is applied to a few batches with the
  ``quant_stats`` flax collection mutable; every conv site sows the absmax
  of its input (``models/unet.py`` call sites), and
  :func:`calibrate_scales` reduces them into a ``{site_key: scale}`` dict
  baked into the quantized model as trace-time constants;
- **epilogue**: the int32 conv output dequantizes into the model's normal
  compute-dtype dropout/BN/relu epilogue — module paths and flax RNG
  folding are UNCHANGED, so MC-dropout masks are identical to the plain
  model's and XLA fuses the dequant multiply like any elementwise op.

Like the bf16 compute dtype and the fast decoder, int8 is an opt-in
inference rewrite riding a measured-envelope gate (tests/test_quant.py);
the reference protocol (/root/reference/bin-dl/brats_test_default.py MC
testing) is unchanged.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

# flax collection the model sows conv-input absmax values into during a
# calibration pass (mutable=["quant_stats"]); never mutated at inference
QUANT_COLLECTION = "quant_stats"

# flax collection a QUANTIZED model sows per-site int8 clipped fractions
# into when applied with mutable=["quant_clip"] (models/unet._sow_clip) —
# the calibration/eval distribution-shift diagnostic. On a normal apply the
# sow is a no-op and the stat DCEs out of the compiled program.
CLIP_COLLECTION = "quant_clip"

# headroom multiplier on calibrated absmax: MC dropout rescales surviving
# channels by 1/(1-p) (~1.053 at the flagship p=0.05) and later batches can
# run slightly hotter than the calibration batches; 10% costs ~0.14 bit of
# the 7-bit range and avoids systematic clipping.
# Measured sweep (round 5, scripts/quant_margin_sweep.py, flagship volume
# on the real chip): margin 1.0 / 1.1 / 1.25 -> 12.67 / 12.67 / 12.69
# Mvox/s and ECE delta vs f32 1.1e-6 / 1.2e-6 / 1.2e-6 — the trade is FLAT
# across the plausible range (the scale constant folds into the requant
# multiply, so the margin is pure rounding-granularity vs clip-headroom),
# so 1.1 stays the default purely for the dropout/shift headroom above.
DEFAULT_MARGIN = 1.1

# production default for UNet.quant_skip_levels: keep the FINEST resolution
# level in the compute dtype. Measured per-op (round 4,
# scripts/conv_stack_attribution.py --int8, effective batch 640): int8 is
# ~2x bf16 from the 60^2 level down (197-294 TF/s) but REGRESSES to
# 67-80 TF/s (~0.6x bf16) at every 240^2 x 32ch full-resolution site — the
# small-channel top level is output-lane-bound, not MAC-bound, so halving
# the operand width buys nothing while the quantize pass adds elementwise
# work on the largest activations. Skipping that one level removes ~40% of
# the full-int8 sum-of-parts time (measured forward legs: --int8-skip 1).
DEFAULT_SKIP_LEVELS = 1

_INT8_MAX = 127.0


def activation_scale(absmax, margin: float = DEFAULT_MARGIN) -> float:
    """Symmetric per-tensor scale for an activation site (host float)."""
    absmax = float(absmax)
    if absmax <= 0.0:  # dead site (constant-zero input): any scale works
        absmax = 1.0
    return absmax * margin / _INT8_MAX


def quantize_activation(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization with saturation."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -_INT8_MAX, _INT8_MAX).astype(jnp.int8)


def quantize_weight(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8 weights.

    kernel: (kh, kw, cin, cout) float -> (int8 kernel, (cout,) f32 scales).
    Runs at trace time from the stored f32 params; checkpoints unchanged.
    """
    kernel = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / _INT8_MAX
    q = jnp.clip(jnp.round(kernel / scale), -_INT8_MAX, _INT8_MAX)
    return q.astype(jnp.int8), scale


def int8_conv(x_q: jnp.ndarray, k_q: jnp.ndarray, padding: int,
              lhs_dilation=None) -> jnp.ndarray:
    """NHWC int8 x int8 -> int32 conv (the MXU's native int8 mode)."""
    dn = jax.lax.conv_dimension_numbers(
        x_q.shape, k_q.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x_q, k_q, (1, 1), [(padding, padding)] * 2,
        lhs_dilation=lhs_dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32)


def _flatten_stats(tree, prefix=()):
    out = {}
    for name, value in tree.items():
        if isinstance(value, dict):
            out.update(_flatten_stats(value, prefix + (name,)))
        else:
            out["/".join(prefix + (name,))] = value
    return out


def site_key(path, leaf: str) -> str:
    """The scales-dict key of a conv site: the sowing module's flax path
    joined with the sow leaf name — identical to the flattened layout
    ``calibrate_scales`` reads back from the ``quant_stats`` collection."""
    return "/".join(tuple(path) + (leaf,))


def clamp_skip_levels(model, skip_levels) -> int:
    """Validate/clamp a requested ``quant_skip_levels`` against ``model``.

    ``None`` resolves to :data:`DEFAULT_SKIP_LEVELS`. Values outside
    ``[0, depth + 1]`` (the U-Net has depth+1 resolution levels) are clamped
    with a warning — an out-of-range skip would either fail later at trace
    time (negative) or silently run a fully-unquantized model that still
    pays for calibration (too large). Shared by eval/direct.py and serve.py
    so both entry points handle the edge case identically.
    """
    if skip_levels is None:
        skip_levels = DEFAULT_SKIP_LEVELS
    depth = getattr(model, "depth", 0)
    clamped = max(0, min(int(skip_levels), depth + 1))
    if clamped != int(skip_levels):
        logging.warning(
            "quantize_skip=%s is outside [0, %d] for a depth-%d model; "
            "clamped to %d (%s)", skip_levels, depth + 1, depth, clamped,
            "no trunk level will be quantized" if clamped == depth + 1
            else "all levels quantized" if clamped == 0 else "partial")
    return clamped


def clipped_fraction(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Fraction of values in ``x`` that saturate the int8 range at ``scale``.

    Debug diagnostic for calibration/eval distribution shift: values with
    ``|x| > 127.5 * scale`` round past the int8 range and saturate in
    :func:`quantize_activation` (values in ``(127, 127.5] * scale`` round
    TO 127 losslessly and are not counted). A hot eval batch (hotter than
    the calibration batches + margin) shows up here as a nonzero rate
    instead of silently degrading accuracy.
    """
    return jnp.mean((jnp.abs(x.astype(jnp.float32))
                     > (_INT8_MAX + 0.5) * scale).astype(jnp.float32))


def clip_report(model, variables, batches, mc_dropout: bool = True,
                rng=None) -> dict:
    """Per-site int8 clipped-fraction report over ``batches``.

    ``model`` must be the QUANTIZED model (``quant_scales`` set). Each batch
    is applied with the :data:`CLIP_COLLECTION` mutable so every quantized
    conv site sows the exact fraction of its input values that saturate the
    int8 range at the site's calibrated scale. Returns ``{site_key: max
    clipped fraction over batches}`` — 0.0 means no clipping; a site whose
    eval distribution runs hotter than calibration + margin shows a nonzero
    rate here instead of silently degrading accuracy. Host-side diagnostic,
    not part of the inference program.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    report = {}
    for i, images in enumerate(batches):
        rngs = {"dropout": jax.random.fold_in(rng, i)} if mc_dropout else None
        _, aux = model.apply(variables, images, train=False,
                             mc_dropout=mc_dropout, rngs=rngs,
                             mutable=[CLIP_COLLECTION])
        flat = _flatten_stats(
            jax.tree_util.tree_map(float, aux.get(CLIP_COLLECTION, {})))
        for key, frac in flat.items():
            report[key] = max(report.get(key, 0.0), frac)
    if not report:
        raise ValueError(
            "clip_report sowed no quant_clip stats — pass the QUANTIZED "
            "model (quant_scales set); unquantized sites sow nothing")
    return report


def calibrate_scales(model, variables, batches, rng=None,
                     mc_dropout: bool = True,
                     margin: float = DEFAULT_MARGIN) -> dict:
    """Run the PLAIN model over calibration batches; return per-site scales.

    ``model`` must be the unquantized model (``quant_scales=None``) with the
    production inference flags (dtype/fast_decoder) already set, so the
    sown absmax values see exactly the activations the quantized program
    will. ``batches``: iterable of image arrays. ``mc_dropout=True``
    calibrates under a dropout sample so the 1/(1-p) channel rescale is in
    the measured range (the margin covers mask-to-mask variation).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    agg = {}
    for i, images in enumerate(batches):
        rngs = {"dropout": jax.random.fold_in(rng, i)} if mc_dropout else None
        _, aux = model.apply(variables, images, train=False,
                             mc_dropout=mc_dropout, rngs=rngs,
                             mutable=[QUANT_COLLECTION])
        flat = _flatten_stats(
            jax.tree_util.tree_map(float, aux[QUANT_COLLECTION]))
        for key, val in flat.items():
            agg[key] = max(agg.get(key, 0.0), val)
    if not agg:
        raise ValueError(
            "calibration pass sowed no quant_stats — the model was built "
            "without conv-site instrumentation (models/unet.py sows only "
            "from UNet/ConvBnRelu call sites)")
    return {key: activation_scale(val, margin) for key, val in agg.items()}
