"""Roofline analysis of the headline fused MC+eval program on the TPU.

Combines XLA's own cost analysis (FLOPs + bytes accessed) with measured
per-volume wall clock to show WHICH v5e roof binds each variant:

- f32: convs execute as 3 bf16 MXU passes, so the compute roof is
  peak_bf16 / 3 — the headline ~31-32% MFU is ~95% of that roof;
- bf16: the conv roof lifts 3x but the pipeline becomes HBM-bound
  (achieved bytes/s approaches the ~819 GB/s v5e HBM peak), which is why
  bf16 only gains ~15%.

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


def main():
    analyze()
    analyze("bfloat16")


if __name__ == "__main__":
    main()
