"""int8 calibration-margin sweep on the bench model (judge r4 item 3c).

Sweeps ``margin`` in {1.0, 1.1, 1.25} through the SAME flagship volume
program bench.py's int8 headline runs (direct+int8+fastdec, bf16 epilogue)
and reports, per margin:

- the ECE delta against the f32 reference leg on the identical volume
  (the accuracy side of the trade: a larger margin spends more of the
  7-bit range on headroom -> coarser in-range quantization; a smaller
  margin clips hotter activations),
- the measured voxel rate (expected flat — the program structure is
  identical, only the baked scale constants change).

Each margin is a distinct set of trace-time constants, i.e. one fresh
compile per margin over the tunnel (~20-300s each, then cached).

Usage: python scripts/quant_margin_sweep.py  (runs on the real TPU)
Results are recorded in ops/quant.py's DEFAULT_MARGIN docstring.
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    import bench  # repo-root module; REPO_ROOT is on sys.path above

    os.environ.setdefault("BENCH_VOLUMES", "2")
    _, _, _, f32_ece = bench.bench_tpu(need_flops=False, artifacts=False)
    out = {"f32_ece": round(f32_ece, 6), "margins": {}}
    for margin in (1.0, 1.1, 1.25):
        best, mean, _, ece = bench.bench_tpu(
            dtype="bfloat16", need_flops=False, artifacts=False,
            fast_decoder=True, quantize=True, quant_margin=margin)
        out["margins"][str(margin)] = {
            "voxels_per_sec": round(best, 1),
            "ece": round(ece, 6),
            "ece_delta_vs_f32": round(abs(ece - f32_ece), 8),
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
