"""Op-level attribution of the bf16 inference gap (VERDICT r2 item 4).

The bf16 direct pipeline sits at neither the MXU conv roof (3x above it)
nor the HBM roof; this script names the consumers by STAGED ABLATION of the
fused volume program: each variant keeps a prefix of the pipeline and
reduces its outputs to scalars (so output transfer is constant and XLA
dead-code-eliminates everything after the kept stage). The wall-clock
difference between consecutive variants is that stage's cost. Ablation is
used instead of an xprof device trace because the remote (axon) tunnel
carries no device-side trace events — wall-clock deltas of compiled
variants are the ground truth available here.

Variants (all bf16 unless --dtype, batch 32, T=20, one BraTS volume):
  logits   : T stochastic U-Net forwards, sum of logits (conv+dropout core)
  softmax  : + per-sample 2-class softmax, sum of probs
  mean     : + mean over the T samples, sum of mean probs (fg)
  entropy  : + normalized entropy map of the mean, sum
  full     : + masked ECE bins + 11-threshold correction (the real program)

Prints one JSON line per variant with voxels/sec and the stage's share of
the full program's time.

Measured results (r3, one v5e chip):
- ablation: the `logits` core is 96% of the full program's time; softmax /
  mean / entropy / the whole eval pass are <= 4% COMBINED — the epilogue is
  NOT the bf16 binder, cheapening it is closed out.
- ``--peak``: a chained 4096^3 bf16 matmul reaches ~117 TFLOP/s — the
  chip's PRACTICAL peak (59% of the 197 nominal). The bf16 pipeline's ~77
  TFLOP/s is ~66% of practical.
- ``--int8_peak`` (r4, 1024-rep chains, epilogue included): int8 98 vs bf16
  42 TF/s at 120^2 x 64ch, 264 vs 154 at 60^2 x 128ch — the MXU's int8 mode
  is a real ~2x; it backs the int8 PTQ path (ops/quant.py), which lifts the
  end-to-end headline 10.5 -> 12.93 Mvox/s (+23%, BENCH_r05_builder2.json
  under the r5 async-window timing; the r4 per-volume-sync capture read
  12.7/+21%, BENCH_r04.json; an uncaptured congestion best read 13.4).
- ``--levels`` (batch 32 per dispatch): 240^2 x 32ch 10 TF/s, 120^2 x 64ch
  29, 60^2 x 128ch 50, 30^2 x 256ch 32 — the small-channel TOP level is the
  inefficient one at the staged batch size. The pipeline still sustains ~77
  TF/s because the T=20 vmap raises the effective conv batch to T x 32 =
  640, filling the MXU even at 32 output channels: the vmap-over-T design
  is not just dispatch amortization, it is what makes the top-level convs
  efficient.
"""
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import (BATCH, C, H, MC_T, PAD_SLICES, THRESHOLDS,  # noqa: E402
                   VOL_SLICES, W)

VARIANTS = ("logits", "softmax", "mean", "entropy", "full")


def build_variant(model, kind):
    from rcu_tpu.ops import calibration as cal_ops
    from rcu_tpu.ops import metrics as metrics_ops
    from rcu_tpu.ops import uncertainty as u_ops

    def run(params, batch_stats, batched, target, mask, thresholds, rng):
        variables = {"params": params, "batch_stats": batch_stats}

        def one_batch(_, inp):
            images, batch_index = inp
            key = jax.random.fold_in(rng, batch_index)
            keys = jax.random.split(key, MC_T)

            if kind == "logits":
                def one(k):
                    out = model.apply(variables, images, train=False,
                                      mc_dropout=True, rngs={"dropout": k})
                    return out.logits
                stack = jax.vmap(one)(keys)
                return None, jnp.sum(stack.astype(jnp.float32))

            def one(k):
                out = model.apply(variables, images, train=False,
                                  mc_dropout=True, rngs={"dropout": k})
                return jax.nn.softmax(out.logits, axis=-1)

            mc_probs = jax.vmap(one)(keys)
            if kind == "softmax":
                return None, jnp.sum(mc_probs)
            probabilities = jnp.mean(mc_probs, axis=0)
            if kind == "mean":
                return None, jnp.sum(probabilities[..., 1])
            ent = metrics_ops.entropy(probabilities, axis=-1)
            if kind == "entropy":
                return None, jnp.sum(probabilities[..., 1]) + jnp.sum(ent)
            return None, (probabilities[..., 1], ent)

        n_batches = batched.shape[0]
        _, out = jax.lax.scan(one_batch, None,
                              (batched, jnp.arange(n_batches)))
        if kind != "full":
            return jnp.sum(out)
        fg, ent = out
        fg = fg.reshape((-1,) + fg.shape[2:])[:VOL_SLICES]
        ent = ent.reshape((-1,) + ent.shape[2:])[:VOL_SLICES] / jnp.log(2.0)
        prediction = fg > 0.5
        ece, bins = cal_ops.ece_binary_with_bins(fg, target, mask)
        correction = u_ops.correction_eval(prediction, target, ent,
                                           thresholds)
        return ece + jnp.sum(correction["corrected_dice"]) \
            + jnp.sum(bins["bins_count"])

    return jax.jit(run)


def main(dtype="bfloat16"):
    from rcu_tpu.models import get_model
    kwargs = dict(nb_classes=2, in_channels=C, depth=4, start_filters=32,
                  dropout=0.05)
    if dtype:
        kwargs["dtype"] = dtype
    model = get_model("unet", kwargs)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda k: model.init({"params": k}, jnp.zeros((1, H, W, C)),
                                 train=False))(jax.random.PRNGKey(0))
    params = jax.device_put(variables["params"])
    batch_stats = jax.device_put(variables.get("batch_stats", {}))

    rng = np.random.RandomState(0)
    batched = jax.device_put(
        rng.rand(PAD_SLICES // BATCH, BATCH, H, W, C).astype(np.float32))
    target = jax.device_put(
        (rng.rand(VOL_SLICES, H, W) < 0.3).astype(np.uint8))
    mask = jax.device_put(rng.rand(VOL_SLICES, H, W) < 0.8)
    th = jnp.asarray(THRESHOLDS, jnp.float32)

    times = {}
    for kind in VARIANTS:
        fn = build_variant(model, kind)
        out = fn(params, batch_stats, batched, target, mask, th,
                 jax.random.PRNGKey(9))
        float(out)  # value fetch = the only reliable remote sync
        best = None
        for v in range(3):
            t0 = time.perf_counter()
            out = fn(params, batch_stats, batched, target, mask, th,
                     jax.random.PRNGKey(v))
            float(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[kind] = best

    full = times["full"]
    prev = None
    for kind in VARIANTS:
        dt = times[kind]
        stage_cost = None if prev is None else dt - times[prev]
        print(json.dumps({
            "variant": kind,
            "dtype": dtype or "float32",
            "volume_seconds": round(dt, 4),
            "voxels_per_sec": round(VOL_SLICES * H * W / dt, 1),
            "stage_seconds": round(stage_cost, 4)
            if stage_cost is not None else None,
            "stage_pct_of_full": round(100 * stage_cost / full, 1)
            if stage_cost is not None else round(100 * dt / full, 1),
        }))
        prev = kind


def matmul_peak():
    """The chip's PRACTICAL bf16 MXU peak: a chained 4096^3 matmul (the
    friendliest possible shape). Measured ~117 TFLOP/s on this image's v5e —
    the reference point the pipeline's achieved TFLOP/s should be judged
    against, not the 197 nominal."""
    n, reps = 4096, 64
    a = jnp.asarray(np.random.RandomState(0).rand(n, n), jnp.bfloat16)

    @jax.jit
    def chain(a):
        x = a
        scale = jnp.bfloat16(1.0 / n)  # 2^-12: exact in bf16
        for _ in range(reps):
            x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
            # keep finite WITHOUT promoting: a f32 scale would make every
            # later dot an f32-operand matmul whose speed depends on the
            # default matmul-precision demotion
            x = x * scale
        return jnp.sum(x.astype(jnp.float32))

    float(chain(a))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    flops = 2.0 * n ** 3 * reps
    print(json.dumps({
        "what": "practical bf16 matmul peak (4096^3 x64)",
        "achieved_tflops_per_s": round(flops / best / 1e12, 1),
        "pct_of_nominal_197t": round(100 * flops / best / 197e12, 1),
    }))


def int8_conv_peak():
    """int8-vs-bf16 chained 3x3 conv at the flagship's mid-level shapes:
    the microbench behind the int8 PTQ path (ops/quant.py). The int8 chain
    includes the production epilogue shape (dequant multiply + requantize
    clip/round) so the measured rate is what the quantized U-Net trunk can
    actually sustain, not a bare-MAC fantasy. Judge the int8 rate against
    2x :func:`matmul_peak` (the MXU runs int8 at twice the bf16 MAC rate)."""
    from rcu_tpu.ops import quant as quant_ops
    reps = 1024  # >=1s of device work per dispatch (the tunnel-RTT rule)
    for hw, ch in ((120, 64), (60, 128)):
        rng = np.random.RandomState(0)
        xf = jnp.asarray(rng.rand(BATCH, hw, hw, ch) - 0.5, jnp.float32)
        kf = jnp.asarray(rng.rand(3, 3, ch, ch) - 0.5, jnp.float32)
        k_q, _ = quant_ops.quantize_weight(kf)
        x_q = quant_ops.quantize_activation(xf, scale=0.5 / 127)
        # requant scale keeps the chain in-range: a 3x3xch conv of +-127
        # inputs sums ~9*ch terms, so dividing by 9*ch keeps int8 occupancy
        requant = 1.0 / (9.0 * ch)

        @jax.jit
        def run_int8(x, k):
            def body(x, _):
                y = quant_ops.int8_conv(x, k, padding=1)
                y = jnp.clip(jnp.round(y.astype(jnp.float32) * requant),
                             -127, 127)
                return y.astype(jnp.int8), ()
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        xb = xf.astype(jnp.bfloat16)
        kb = kf.astype(jnp.bfloat16)
        scale = jnp.bfloat16(1.0 / 64)  # keep finite without promoting

        @jax.jit
        def run_bf16(x, k):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            def body(x, _):
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1)] * 2, dimension_numbers=dn,
                    preferred_element_type=jnp.bfloat16)
                return y * scale, ()
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        flops = 2.0 * 9 * ch * ch * hw * hw * BATCH * reps
        for name, fn, a, k in (("int8", run_int8, x_q, k_q),
                               ("bf16", run_bf16, xb, kb)):
            float(fn(a, k))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(a, k))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(json.dumps({
                "level_hw": hw, "channels": ch, "dtype": name,
                "seconds": round(best, 3),
                "achieved_tflops_per_s": round(flops / best / 1e12, 2),
            }))


def conv_levels(dtype="bfloat16"):
    """Per-U-Net-level conv efficiency: ONE 3x3 conv applied ``reps`` times
    via lax.scan (weight-reused; ~1s of device work so the remote dispatch
    round trip stops dominating — an unrolled chain at repeats=8 read every
    level as ~2% of peak, pure tunnel latency) at each level's (spatial,
    channel) shape. Each level carries the SAME FLOPs in the paper U-Net
    (spatial /4 and channels x4 cancel), so per-level efficiency directly
    weights the whole forward. Judge against :func:`matmul_peak`, not the
    nominal 197."""
    import flax.linen as nn

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    for hw, ch, reps in ((240, 32, 96), (120, 64, 96), (60, 128, 96),
                         (30, 256, 96)):
        conv = nn.Conv(ch, (3, 3), padding=1, dtype=jdtype)
        x0 = jnp.asarray(np.random.RandomState(0).rand(BATCH, hw, hw, ch),
                         jdtype)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = jax.jit(conv.init)(jax.random.PRNGKey(0),
                                           jnp.zeros((1, hw, hw, ch),
                                                     jdtype))
        variables = jax.device_put(variables)

        @jax.jit
        def run(variables, x, conv=conv, reps=reps):
            def body(x, _):
                return conv.apply(variables, x), ()
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        float(run(variables, x0))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(variables, x0))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        flops = 2.0 * 9 * ch * ch * hw * hw * BATCH * reps
        print(json.dumps({
            "level_hw": hw, "channels": ch, "dtype": dtype,
            "seconds": round(best, 3),
            "achieved_tflops_per_s": round(flops / best / 1e12, 2),
        }))


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--levels", action="store_true",
                        help="per-U-Net-level conv efficiency microbench")
    parser.add_argument("--peak", action="store_true",
                        help="practical bf16 matmul peak calibration")
    parser.add_argument("--int8_peak", action="store_true",
                        help="int8-vs-bf16 chained-conv microbench (the "
                             "measurement behind ops/quant.py)")
    args = parser.parse_args()
    dtype = None if args.dtype in ("f32", "float32", "none") else args.dtype
    if args.peak:
        matmul_peak()
    elif args.int8_peak:
        int8_conv_peak()
    elif args.levels:
        conv_levels(args.dtype)
    else:
        main(dtype)
