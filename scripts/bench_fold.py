"""One-window capture of the single-forward aux-feat perf matrix: f32
(prior production), bf16+fastdec (the unfolded opt-in — flax BN's f32
activation promotion binds it), and bf16+fastdec+fold_bn (the load-time BN
fold, models/unet.fold_bn_params). Writes BENCH_r05_fold.json-style output
so the README/CLAUDE numbers point at a committed artifact.

Usage: python scripts/bench_fold.py [out.json]
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402


def main(out_path=None):
    legs = {
        "aux_feat_f32": dict(),
        "aux_feat_bf16_fastdec": dict(dtype="bfloat16", fast_decoder=True),
        "aux_feat_bf16_fastdec_fold": dict(dtype="bfloat16",
                                           fast_decoder=True, fold_bn=True),
    }
    out = {"volumes": int(os.environ.get("BENCH_VOLUMES", "3")),
           "unit": "voxel/s",
           "note": "same-window capture; fold_bn = load-time BN fold "
                   "(deterministic single-forward protocols)"}
    for name, kw in legs.items():
        try:
            best, mean = bench.bench_aux_feat(**kw)
            out[name + "_voxels_per_sec"] = round(best, 1)
            out[name + "_mean"] = round(mean, 1)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = f"{type(e).__name__}: {e}"
        print(name, {k: v for k, v in out.items() if k.startswith(name)},
              flush=True)
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as fp:
            fp.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
