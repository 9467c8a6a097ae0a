"""Direct one-pass test+eval CLI (no reference counterpart).

Streams each test-split subject through ONE fused device program (T-sample
MC-dropout + calibration bins + 11-threshold correction analysis) and writes
the standard eval CSV families — skipping the NIfTI staging round trip of the
``*_test_*`` -> ``eval_uncertainty`` pipeline. Sigma-headed (aleatoric)
checkpoints are detected automatically and evaluate via the sigma protocol:
a global min/max pass, then per-subject rescale+fold+eval, with the staged
run's ``_globalrescale`` result ids. Use the staged pipeline when the
per-subject artifacts themselves are needed.

Usage:
  python bin/eval_direct.py -config_file config/test_brats_baseline_mc.yaml \
      [-run_id baseline_mc] [-out_dir out/eval/brats/direct] [-devices N]
"""
import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
BIN_DIR = os.path.dirname(os.path.abspath(__file__))
if BIN_DIR not in sys.path:
    sys.path.insert(0, BIN_DIR)


def main(config_file, run_id=None, out_dir=None, devices=None,
         throughput=False, unmasked=False):
    import _cli
    from rcu_tpu.eval.direct import evaluate_direct

    config = _cli.load_test_config(config_file)
    mesh = _cli.mesh_from_devices(devices)
    run_id = run_id or config.test_name or "baseline"
    out_dir = out_dir or os.path.join(
        os.path.dirname(config.model_dir or "."), "eval_direct")
    eces = evaluate_direct(config, out_dir, run_id=run_id, mesh=mesh,
                           subject_parallel=throughput, masked=not unmasked)
    for subject, ece in eces.items():
        print(f"{subject}: ece={ece:.5f}")
    print(f"wrote eval CSVs to {out_dir}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    parser = argparse.ArgumentParser(description="Direct one-pass test+eval")
    parser.add_argument("-config_file", type=str, required=True)
    parser.add_argument("-run_id", type=str, default=None)
    parser.add_argument("-out_dir", type=str, default=None)
    parser.add_argument("-devices", type=int, default=None)
    parser.add_argument("-throughput", action="store_true",
                        help="whole subjects round-robin across devices "
                             "(fastest testset wall clock) instead of "
                             "sharding each volume (fastest single answer)")
    parser.add_argument("-unmasked", action="store_true",
                        help="skip the BraTS t2>0 foreground mask (the ISIC "
                             "convention)")
    args = parser.parse_args()
    main(args.config_file, args.run_id, args.out_dir, args.devices,
         args.throughput, args.unmasked)
