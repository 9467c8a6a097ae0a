"""Roofline analysis of the fused MC+eval program AND the training step on
the TPU.

Combines XLA's own cost analysis (FLOPs + bytes accessed) with measured
wall clock to show WHICH v5e roof binds each variant.

Inference (``--section infer``, one JSON line per dtype):
- f32: convs execute as 3 bf16 MXU passes, so the compute roof is
  peak_bf16 / 3 — the headline ~31-32% MFU is ~95% of that roof;
- bf16: gains only ~15% staged / ~30% direct over f32. Attribution
  (measured r3, scripts/bf16_gap_analysis.py): the elementwise epilogue —
  per-sample softmax, MC mean, entropy, the whole fused eval — costs <= 4%
  of the volume time COMBINED (cheapening it is closed out); ~96% is the
  T=20 U-Net forward stack itself. Judged against the chip's PRACTICAL
  peak (``--peak``: a chained 4096^3 bf16 matmul reaches ~117 TFLOP/s, not
  the 197 nominal), the bf16 pipeline's ~77 TFLOP/s is ~66% of what the
  MXU demonstrably delivers — the apparent "3x headroom to the nominal
  roof" is mostly nominal-vs-practical peak plus conv-vs-matmul overhead,
  not a recoverable epilogue cost.

Training (``--section train``): fwd+bwd+adam+BN on 32x240x240x4 batches is
**HBM-bound at both dtypes** (measured r3: f32 12.3 Mvox/s best = 28% of the
3-pass conv roof but 71% of the HBM upper-bound estimate; bf16 16.9-17.4
Mvox/s = 13% conv / 64% HBM): the backward pass streams stored activations.
Measured negative result (the remat question, closed like r2's BN-folding):
wrapping the whole forward in ``jax.checkpoint`` — recompute activations in
the bwd instead of storing them — LOSES 15% (f32, 12.0 -> 10.2 Mvox/s) and
17% (bf16, 17.4 -> 14.4), with XLA-counted bytes RISING 87 -> 104 GB (f32):
XLA's fusion already avoids materializing the elementwise intermediates
remat would save, so full-graph recompute only adds the extra forward's
traffic and FLOPs (the selective 'conv' policy measures -12/-14%, same
cause). The input pipeline is not the binder either, including at the
8-chip v5e target: the single-core host loader feeds ~176 Mvox/s
unshuffled / ~104 shuffled (scripts/bench_loader.py, ranged read_direct
collate) vs the 8 x 17.4 = 139 Mvox/s 8-chip bf16 demand; fully shuffled
multi-host runs cover the gap with the loader's per-host subject sharding
(shard=(host, n_hosts)).

Prints one JSON line per dtype. Run on the real chip: the persistent
compile cache makes repeats fast.
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
                   VOL_SLICES, W, _build)

V5E_BF16_PEAK = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def analyze(dtype=None):
    fused, params, batch_stats, model = _build(dtype)
    rng = np.random.RandomState(0)
    batched = jax.device_put(
        rng.rand(PAD_SLICES // BATCH, BATCH, H, W, C).astype(np.float32))
    target = jax.device_put((rng.rand(VOL_SLICES, H, W) < 0.3).astype(np.uint8))
    mask = jax.device_put(rng.rand(VOL_SLICES, H, W) < 0.8)
    th = jnp.asarray(THRESHOLDS, jnp.float32)

    compiled = fused.lower(params, batch_stats, batched, target, mask, th,
                           jax.random.PRNGKey(0)).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    # cost_analysis counts a lax.scan body ONCE; scale by the trip count
    trips = PAD_SLICES // BATCH
    flops = float(analysis.get("flops", 0.0)) * trips
    # NOTE: "bytes accessed" is XLA's per-op logical sum — an upper estimate
    # of HBM traffic (fusion-internal reuse isn't subtracted)
    bytes_accessed = float(analysis.get("bytes accessed", 0.0)) * trips

    out = compiled(params, batch_stats, batched, target, mask, th,
                   jax.random.PRNGKey(1))
    float(jnp.sum(out["correction"]["corrected_dice"]) + out["ece"])  # sync
    times = []
    for v in range(3):
        t0 = time.perf_counter()
        out = compiled(params, batch_stats, batched, target, mask, th,
                       jax.random.PRNGKey(v))
        float(jnp.sum(out["correction"]["corrected_dice"]) + out["ece"])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    achieved_flops = flops / dt
    achieved_bytes = bytes_accessed / dt
    conv_roof = V5E_BF16_PEAK / (3 if dtype is None else 1)
    print(json.dumps({
        "dtype": dtype or "float32",
        "volume_seconds": round(dt, 4),
        "voxels_per_sec": round(VOL_SLICES * H * W / dt, 1),
        "program_tflops": round(flops / 1e12, 2),
        "achieved_tflops_per_s": round(achieved_flops / 1e12, 2),
        "pct_of_bf16_peak": round(100 * achieved_flops / V5E_BF16_PEAK, 1),
        "pct_of_conv_roof": round(100 * achieved_flops / conv_roof, 1),
        "program_gbytes_accessed": round(bytes_accessed / 1e9, 1),
        "achieved_gbytes_per_s": round(achieved_bytes / 1e9, 1),
        "pct_of_hbm_peak": round(100 * achieved_bytes / V5E_HBM_BYTES_PER_S, 1),
    }))


def analyze_train(dtype=None, hbm_practical=None, remat=None):
    """Train-step roofline: fwd+bwd+optax+BN via XLA cost analysis of the
    compiled step, same methodology as the inference section (bytes accessed
    is an upper estimate of HBM traffic). ``hbm_practical`` (bytes/s, from
    rcu_tpu.utils.profiling.measure_practical_hbm) restates the HBM
    percentage against the MEASURED bandwidth; ``remat`` selects the
    train-step rematerialization policy (see engine/steps.make_train_step)."""
    from rcu_tpu.engine import steps as steps_lib
    from rcu_tpu.engine.state import create_train_state
    from rcu_tpu.models import get_model, get_optimizer

    B = BATCH
    kwargs = dict(nb_classes=2, in_channels=C, depth=4, start_filters=32,
                  dropout=0.05)
    if dtype:
        kwargs["dtype"] = dtype
    model = get_model("unet", kwargs)
    optimizer = get_optimizer("adam", {"lr": 1e-4})
    state = create_train_state(model, optimizer, (1, H, W, C))
    train_step = steps_lib.make_train_step(model, optimizer, remat=remat)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, C), jnp.float32),
        "labels": jnp.asarray(rng.rand(B, H, W) > 0.5, jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    analysis = train_step.lower(state, batch, key).compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    flops = float(analysis.get("flops", 0.0))
    bytes_accessed = float(analysis.get("bytes accessed", 0.0))

    state, metrics = train_step(state, batch, key)
    float(metrics["loss"])
    rates = []
    for c in range(4):
        t0 = time.perf_counter()
        for i in range(5):
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(key, c * 5 + i))
        float(metrics["loss"])
        rates.append(5 / (time.perf_counter() - t0))
    steps_per_sec = max(rates)

    conv_roof = V5E_BF16_PEAK / (3 if dtype is None else 1)
    achieved_flops = flops * steps_per_sec
    achieved_bytes = bytes_accessed * steps_per_sec
    hbm_roof = hbm_practical or V5E_HBM_BYTES_PER_S
    print(json.dumps({
        "section": "train",
        "dtype": dtype or "float32",
        "remat": remat or "none",
        "voxels_per_sec": round(steps_per_sec * B * H * W, 1),
        "step_tflops": round(flops / 1e12, 2),
        "mfu": round(achieved_flops / V5E_BF16_PEAK, 4),
        "pct_of_conv_roof": round(100 * achieved_flops / conv_roof, 1),
        "step_gbytes_accessed": round(bytes_accessed / 1e9, 1),
        "pct_of_hbm_nominal": round(
            100 * achieved_bytes / V5E_HBM_BYTES_PER_S, 1),
        "pct_of_hbm_practical": round(100 * achieved_bytes / hbm_practical,
                                      1) if hbm_practical else None,
        "hbm_practical_gb_per_s": round(hbm_practical / 1e9, 1)
        if hbm_practical else None,
        "binding_roof": "hbm-bandwidth"
        if achieved_bytes / hbm_roof > achieved_flops / conv_roof
        else "conv-compute",
    }))


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--section", choices=["infer", "train", "all"],
                        default="all")
    args = parser.parse_args()
    if args.section in ("infer", "all"):
        analyze()
        analyze("bfloat16")
    if args.section in ("train", "all"):
        from rcu_tpu.utils.profiling import measure_practical_hbm
        hbm_practical = measure_practical_hbm()
        print(json.dumps({
            "section": "train", "metric": "hbm_practical_gb_per_s",
            "value": round(hbm_practical / 1e9, 1),
            "nominal": round(V5E_HBM_BYTES_PER_S / 1e9, 1)}))
        for remat in (None, "conv"):
            analyze_train(hbm_practical=hbm_practical, remat=remat)
            analyze_train("bfloat16", hbm_practical=hbm_practical,
                          remat=remat)


if __name__ == "__main__":
    main()
