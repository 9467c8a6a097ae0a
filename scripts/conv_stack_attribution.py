"""Per-op attribution of the remaining bf16 conv-stack gap (round 4).

``bf16_gap_analysis.py`` closed the epilogue question (<=4%) and pinned the
T=20 U-Net forward at ~66% of the chip's PRACTICAL bf16 matmul peak
(~77 of ~117 TFLOP/s). This script asks WHERE inside the forward the other
34% goes, by benchmarking every op family of the flagship forward —
each ConvBnRelu (conv + channel dropout + inference BN + relu, exactly the
fused unit the real program runs), each pool and upsample — standalone at
the REAL effective batch (T x B = 640: the T=20 vmap batches every conv),
then comparing the FLOP-weighted sum of best-case op times against the
measured whole-forward time:

- if the sum of parts ~= the whole, the gap is per-op shape inefficiency
  (see which ops sit below the practical peak);
- if the whole >> sum of parts, the gap is fusion/boundary overhead
  between ops (HBM round trips XLA didn't elide).

Legs:
  --ops     per-op inventory (default)
  --widen   C_out sweep at the 240^2 x 32ch level: is the 128-lane MXU
            output dimension the binder for small-channel convs?
  --forward measured T=20 whole-forward rate (same numbers as
            bf16_gap_analysis's `logits` variant, re-measured here so the
            sum-vs-whole comparison is contemporaneous)
  --boundary concat-vs-split-kernel probe at every decoder level: is the
            skip concat an unfused HBM cost the split-kernel rewrite
            (conv_a(up) + conv_b(skip), checkpoint-compatible) would avoid?
  --int8    run the ops/forward legs with the int8 PTQ trunk (ops/quant.py:
            every ConvBnRelu/up-conv site quantize->int8 conv->dequant,
            same rewrite the production `-quantize` path uses). Answers
            WHERE the end-to-end int8 win (+23%, BENCH_r05_builder2.json;
            r4 read +21%, BENCH_r04.json) lands
            vs the ~2x conv-microbench rate: per-LEVEL int8 speedup (the
            top 240^2 x 32ch level's output-lane binder does not care
            about operand width) and the quant/dequant boundary share
            (sum-of-parts vs whole, same methodology as the bf16 gap).

Every leg packs >= ~1s of device work per dispatch (lax.scan over reps)
so the remote-tunnel round trip does not contaminate rates (CLAUDE.md).
Shapes mirror the flagship BraTS config: depth 4, start_filters 32,
4 input channels, 240^2 slices, batch 32, T=20
(reference config/train_brats_baseline.yaml:6-12 workload).
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

BATCH, MC_T = 32, 20          # flagship MC protocol (T=20 vmap, batch 32)
B_EFF = BATCH * MC_T          # every conv in the vmapped forward sees this
DEPTH, SF, IN_CH, RES = 4, 32, 4, 240
RATE_GUESS_TFLOPS = 60.0      # sizes reps for ~1s of device work per leg
HBM_GUESS_GBPS = 600.0        # sizes reps for bandwidth ops (pool/upsample)
TARGET_S = 0.9


def _init_on_device(module, x_shape, dtype):
    """Init params ON DEVICE (one cached remote compile) — the largest
    per-op module carries ~9 MB of f32 conv weights, which a congested
    tunnel cannot upload (same rationale as run_forward's init)."""
    return jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(x_shape, dtype), train=False, mc_dropout=True))()


def _device_input(shape, dtype):
    """Generate the bench input ON DEVICE: effective-batch-640 activations
    are GBs, and the remote tunnel cannot upload that (congestion takes it
    below 1 MB/s) — every timed leg must be H2D-free."""
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(7), shape, jnp.float32).astype(dtype))()


def _time_best(fn, *args, warm=1, reps=3):
    for _ in range(warm):
        float(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _scan_bench(apply_fn, x_shape, flops_per_call, dtype, needs_rng=False):
    """Best-case seconds per call for ``apply_fn(x)`` measured under a
    lax.scan whose per-iteration input is perturbed by a traced scalar
    (prevents XLA from hoisting the loop-invariant op out of the scan even
    when the op changes shape)."""
    reps = int(max(4, min(4096, round(
        TARGET_S * RATE_GUESS_TFLOPS * 1e12 / max(flops_per_call, 1.0)))))
    x0 = _device_input(x_shape, dtype)
    salts = jnp.zeros((reps,), dtype)

    @jax.jit
    def run(x, salts):
        def body(acc, s):
            y = apply_fn(x + s)
            return acc + jnp.sum(y.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), salts)
        return acc

    best = _time_best(run, x0, salts)
    return best / reps, reps


def conv_bn_relu(out_ch, dtype, kernel=3, quantize=False):
    from rcu_tpu.models.unet import ConvBnRelu
    scales = None
    if quantize:
        # bench inputs are uniform [0, 1] (absmax 1.0); a standalone
        # top-level ConvBnRelu's one conv site keys as "Conv_0_in_absmax"
        # (ops/quant.site_key with an empty module path) — the same scale
        # calibrate_scales would return, without a remote calibration pass
        from rcu_tpu.ops import quant as quant_ops
        scales = {"Conv_0_in_absmax": quant_ops.activation_scale(1.0)}
    return ConvBnRelu(out_ch, dropout=0.2, bn=True, quant_scales=scales,
                      kernel=kernel, padding=kernel // 2, dtype=dtype)


def _op_inventory():
    """(name, in_ch, out_ch, hw, kind) for every op of the flagship forward.
    kind: 'cbr' = ConvBnRelu (the real fused unit), 'pool', 'up' (nearest
    2x upsample), 'upconv' (the 3x3 conv after upsample). FLOPs at 240^2
    dominate; each resolution r carries enc a+b convs, a pool, and (except
    the bottom) an upsample + upconv + dec a+b convs at the same r."""
    ops = []
    ch, res = SF, RES
    in_ch = IN_CH
    for i in range(DEPTH):
        ops.append((f"enc{i}a_{res}x{in_ch}->{ch}", in_ch, ch, res, "cbr"))
        ops.append((f"enc{i}b_{res}x{ch}->{ch}", ch, ch, res, "cbr"))
        ops.append((f"pool{i}_{res}x{ch}", ch, ch, res, "pool"))
        in_ch, ch, res = ch, ch * 2, res // 2
    ops.append((f"bot_a_{res}x{in_ch}->{ch}", in_ch, ch, res, "cbr"))
    ops.append((f"bot_b_{res}x{ch}->{ch}", ch, ch, res, "cbr"))
    for k in range(DEPTH):
        ch //= 2
        ops.append((f"up{k}_{res}->{res*2}x{ch*2}", ch * 2, ch * 2, res, "up"))
        res *= 2
        ops.append((f"upconv{k}_{res}x{ch*2}->{ch}", ch * 2, ch, res, "upconv"))
        ops.append((f"dec{k}a_{res}x{ch*2}->{ch}", ch * 2, ch, res, "cbr"))
        ops.append((f"dec{k}b_{res}x{ch}->{ch}", ch, ch, res, "cbr"))
    ops.append((f"head_{res}x{ch}->{ch}", ch, ch, res, "cbr"))
    return ops


def _op_flops(in_ch, out_ch, hw, kind):
    if kind in ("cbr", "upconv"):
        return 2.0 * 9 * in_ch * out_ch * hw * hw * B_EFF
    return 0.0  # pool/up are bandwidth ops; report GB moved instead


def run_ops(dtype_str, quantize=False):
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    total_s, total_flops = 0.0, 0.0
    rows = []
    for name, in_ch, out_ch, hw, kind in _op_inventory():
        x_shape = (B_EFF, hw, hw, in_ch)
        flops = _op_flops(in_ch, out_ch, hw, kind)
        if kind in ("cbr", "upconv"):
            if kind == "cbr":
                mod = conv_bn_relu(out_ch, dtype, quantize=quantize)
                variables = _init_on_device(mod, (1, hw, hw, in_ch), dtype)
                rng = jax.random.PRNGKey(2)

                def apply_fn(x, mod=mod, variables=variables, rng=rng):
                    return mod.apply(variables, x, train=False,
                                     mc_dropout=True, rngs={"dropout": rng})
            elif quantize:
                # the production int8 up-conv site (models/unet.py setup):
                # quantize -> int8 conv -> dequant, bench-input absmax 1.0
                from rcu_tpu.models.unet import _QuantConv
                from rcu_tpu.ops import quant as quant_ops
                mod = _QuantConv(out_ch, kernel=3, padding=1, dtype=dtype)
                variables = jax.jit(lambda mod=mod, c=in_ch, r=hw: mod.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, r, r, c), dtype)))()
                a_scale = quant_ops.activation_scale(1.0)

                def apply_fn(x, mod=mod, variables=variables, s=a_scale):
                    return mod.apply(variables, x, a_scale=s)
            else:
                import flax.linen as nn
                mod = nn.Conv(out_ch, (3, 3), padding=1, dtype=dtype)
                variables = jax.jit(lambda: mod.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, hw, hw, in_ch), dtype)))()

                def apply_fn(x, mod=mod, variables=variables):
                    return mod.apply(variables, x)
        elif kind == "pool":
            import flax.linen as nn

            def apply_fn(x):
                return nn.max_pool(x, (2, 2), strides=(2, 2))
            flops = 0.0
        else:  # up
            from rcu_tpu.models.unet import _upsample_nearest_2x as apply_fn
        itemsize = 2 if dtype_str == "bfloat16" else 4
        moved_gb = (np.prod(x_shape) * itemsize *
                    (1 + (0.25 if kind == "pool" else 4 if kind == "up" else 1)
                     * out_ch / in_ch)) / 1e9
        # bandwidth ops: size reps from bytes moved at a stream-rate guess so
        # the deep (small) levels still pack ~1 s per dispatch; a fixed rep
        # count left them RTT-contaminated on the remote tunnel
        est_flops = flops or (moved_gb / HBM_GUESS_GBPS *
                              RATE_GUESS_TFLOPS * 1e12)
        sec, reps = _scan_bench(apply_fn, x_shape, est_flops, dtype)
        row = {"op": name, "kind": kind, "seconds_per_call": round(sec, 5),
               "reps": reps}
        if flops:
            row["tflops_per_s"] = round(flops / sec / 1e12, 1)
        else:
            row["approx_gb_per_s"] = round(moved_gb / sec, 1)
        rows.append(row)
        total_s += sec
        total_flops += flops
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "what": (f"sum of parts ({'int8 trunk, ' if quantize else ''}"
                 f"{dtype_str}, effective batch {B_EFF})"),
        "sum_seconds_per_forward": round(total_s, 4),
        "sum_conv_flops_per_forward": total_flops,
        "flop_weighted_tflops_per_s": round(total_flops / total_s / 1e12, 1),
    }), flush=True)
    return total_s


def run_forward(dtype_str, split_decoder=False, fused_upsample=False,
                quantize=False, int8_skip=0):
    """Measured whole T=20 vmapped forward (the `logits` ablation variant):
    the number the per-op sum is judged against. With ``split_decoder`` the
    decoder consumes (up, skip) via the split-kernel rewrite
    (models/unet.py split_decoder_concat) instead of materializing the
    concat — the production-candidate form the --boundary probe motivates.
    ``quantize`` reruns it with the int8 PTQ trunk, calibrated on one
    device-generated batch exactly like the production path."""
    from rcu_tpu.models.unet import UNet
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    model = UNet(nb_classes=2, in_channels=IN_CH, depth=DEPTH,
                 start_filters=SF, dropout=0.2, dtype=dtype,
                 split_decoder_concat=split_decoder,
                 fused_upsample=fused_upsample)
    # init ON DEVICE: the flagship param tree is ~34 MB, which a congested
    # tunnel cannot upload; one cached remote compile is cheaper.
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, RES, RES, IN_CH), dtype)))()
    keys = jax.random.split(jax.random.PRNGKey(3), MC_T)
    x0 = _device_input((BATCH, RES, RES, IN_CH), dtype)
    if quantize:
        from rcu_tpu.ops import quant as quant_ops
        scales = quant_ops.calibrate_scales(model, variables, [x0[:2]])
        model = model.copy(quant_scales=scales, quant_skip_levels=int8_skip)
    reps = 8
    salts = jnp.zeros((reps,), dtype)

    @jax.jit
    def run(variables, x, keys, salts):
        def one(k, xs):
            return model.apply(variables, xs, train=False, mc_dropout=True,
                               rngs={"dropout": k}).logits

        def body(acc, s):
            logits = jax.vmap(one, in_axes=(0, None))(keys, x + s)
            return acc + jnp.sum(logits.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), salts)
        return acc

    best = _time_best(run, variables, x0, keys, salts)
    sec = best / reps
    flops = sum(_op_flops(i, o, hw, k) for _, i, o, hw, k in _op_inventory())
    print(json.dumps({
        "what": (f"whole T={MC_T} forward ({dtype_str}, batch {BATCH}"
                 f"{', split-kernel decoder' if split_decoder else ''}"
                 f"{', fused upsample' if fused_upsample else ''}"
                 f"{(', int8 trunk skip ' + str(int8_skip) + ' levels')
                    if quantize and int8_skip else
                    (', int8 trunk' if quantize else '')})"),
        "seconds_per_forward": round(sec, 4),
        "conv_tflops_per_s": round(flops / sec / 1e12, 1),
    }), flush=True)
    return sec


def run_boundary(dtype_str):
    """concat-vs-split probe at every decoder level: conv(concat(a, b)) ==
    conv_a(a) + conv_b(b) with the kernel split along input channels — same
    FLOPs, same params, but the 2*ch concat activation is never written. If
    the split form is faster standalone, the decoder concats are a real
    (unfused) HBM cost inside the whole forward, and the rewrite is a
    checkpoint-compatible optimization candidate."""
    import flax.linen as nn
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    ch, res = SF * (2 ** (DEPTH - 1)), RES // (2 ** (DEPTH - 1))
    for _ in range(DEPTH):
        mod = nn.Conv(ch, (3, 3), padding=1, dtype=dtype)
        variables = jax.jit(lambda mod=mod, c=ch: mod.init(
            jax.random.PRNGKey(0), jnp.zeros((1, res, res, 2 * c), dtype)))()
        # raw lax.conv does not promote dtypes (flax casts for the fused
        # leg); cast the split kernels/bias to the bench dtype explicitly
        kernel = variables["params"]["kernel"].astype(dtype)
        k_a, k_b = kernel[:, :, :ch], kernel[:, :, ch:]
        bias = variables["params"]["bias"].astype(dtype)
        dn = jax.lax.conv_dimension_numbers(
            (1, res, res, ch), (3, 3, ch, ch), ("NHWC", "HWIO", "NHWC"))

        # input is a STACKED pair (2, B, r, r, ch) so the concat form really
        # has to gather two separate operands, exactly like up+skip do
        def fused(x, variables=variables, mod=mod):
            return mod.apply(variables, jnp.concatenate([x[0], x[1]], -1))

        def split(x, k_a=k_a, k_b=k_b, bias=bias, dn=dn):
            ya = jax.lax.conv_general_dilated(x[0], k_a, (1, 1), "SAME",
                                              dimension_numbers=dn)
            yb = jax.lax.conv_general_dilated(x[1], k_b, (1, 1), "SAME",
                                              dimension_numbers=dn)
            return ya + yb + bias
        flops = 2.0 * 9 * (2 * ch) * ch * res * res * B_EFF
        for name, fn in (("fused", fused), ("split", split)):
            sec, reps = _scan_bench(fn, (2, B_EFF, res, res, ch), flops,
                                    dtype)
            print(json.dumps({
                "what": f"dec concat {res}^2 x {2*ch}->{ch} [{name}]",
                "seconds_per_call": round(sec, 5),
                "tflops_per_s": round(flops / sec / 1e12, 1),
                "reps": reps,
            }), flush=True)
        ch //= 2
        res *= 2


def run_widen(dtype_str):
    """C_out sweep at the top level: rate ~ C_out means the MXU's 128-lane
    output dim binds small-channel convs; flat rate means it doesn't."""
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    for out_ch in (8, 16, 32, 64, 128):
        mod = conv_bn_relu(out_ch, dtype)
        variables = _init_on_device(mod, (1, RES, RES, SF), dtype)
        rng = jax.random.PRNGKey(2)

        def apply_fn(x, mod=mod, variables=variables, rng=rng):
            return mod.apply(variables, x, train=False, mc_dropout=True,
                             rngs={"dropout": rng})
        flops = 2.0 * 9 * SF * out_ch * RES * RES * B_EFF
        sec, reps = _scan_bench(apply_fn, (B_EFF, RES, RES, SF), flops, dtype)
        print(json.dumps({
            "what": f"widen 240^2 x {SF}ch -> C_out={out_ch}",
            "seconds_per_call": round(sec, 5),
            "tflops_per_s": round(flops / sec / 1e12, 1),
            "reps": reps,
        }), flush=True)


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--ops", action="store_true")
    parser.add_argument("--widen", action="store_true")
    parser.add_argument("--forward", action="store_true")
    parser.add_argument("--boundary", action="store_true")
    parser.add_argument("--split-decoder", action="store_true",
                        help="run --forward with split_decoder_concat=True")
    parser.add_argument("--fused-upsample", action="store_true",
                        help="run --forward with fused_upsample=True")
    parser.add_argument("--int8", action="store_true",
                        help="quantize the conv sites (ops/forward legs)")
    parser.add_argument("--int8-skip", type=int, default=0,
                        help="keep the N finest levels unquantized on the "
                             "--int8 forward leg (models/unet.py "
                             "quant_skip_levels)")
    args = parser.parse_args()
    if (args.split_decoder or args.fused_upsample) \
            and (args.widen or args.boundary):
        # these flags only parameterize the forward leg; a 20-300 s remote
        # measurement must not be silently attributed to the wrong variant
        parser.error("--split-decoder/--fused-upsample only apply to the "
                     "forward leg (use them with --forward or no leg flag)")
    if args.int8 and (args.widen or args.boundary):
        parser.error("--int8 applies to the ops/forward legs only")
    if args.widen:
        run_widen(args.dtype)
    elif args.boundary:
        run_boundary(args.dtype)
    elif args.forward:
        run_forward(args.dtype, split_decoder=args.split_decoder,
                    fused_upsample=args.fused_upsample, quantize=args.int8,
                    int8_skip=args.int8_skip)
    else:
        run_ops(args.dtype, quantize=args.int8)
        run_forward(args.dtype, split_decoder=args.split_decoder,
                    fused_upsample=args.fused_upsample, quantize=args.int8,
                    int8_skip=args.int8_skip)
