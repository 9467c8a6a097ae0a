"""Direct one-pass test+eval CLI (no reference counterpart).

Streams each test-split subject through ONE fused device program (inference
+ calibration bins + 11-threshold correction analysis) and writes the
standard eval CSV families — skipping the NIfTI staging round trip of the
``*_test_*`` -> ``eval_uncertainty`` pipeline. Every reference strategy is
covered: MC-dropout/deterministic (entropy protocol), aleatoric (sigma-head
auto-detect, two-pass ``_globalrescale`` protocol), ensemble (stacked
members from ``others.model_dir``, EP over a 2-D mesh) and auxiliary
feat/segm (confidence protocol, ``_rescale`` ids). The strategy is
auto-detected from the checkpoint and config; ``-strategy`` overrides. Use
the staged pipeline only when the per-subject artifacts themselves are
needed.

Usage:
  python bin/eval_direct.py -config_file config/test_brats_baseline_mc.yaml \
      [-run_id baseline_mc] [-out_dir out/eval/brats/direct] [-devices N] \
      [-strategy mc|deterministic|aleatoric|ensemble|auxiliary_feat|auxiliary_segm]
"""
import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, ""):  # bare-checkout script mode: python bin/<name>.py
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    BIN_DIR = os.path.dirname(os.path.abspath(__file__))
    if BIN_DIR not in sys.path:
        sys.path.insert(0, BIN_DIR)


def main(config_file, run_id=None, out_dir=None, devices=None,
         throughput=False, unmasked=False, strategy=None, mc=None,
         dtype=None, eval_tree=False, dispatch_chunks=4, fast_decoder=False,
         fold_bn=False, quantize=False, quantize_skip=None):
    try:  # package mode: rcu_tpu.cli.* (console entry points)
        from . import _cli
    except ImportError:  # bare-checkout script mode
        import _cli
    from rcu_tpu.eval.direct import evaluate_direct

    config = _cli.load_test_config(config_file)
    mesh = _cli.mesh_from_devices(devices)
    run_id = run_id or config.test_name or "baseline"
    out_dir = out_dir or os.path.join(
        os.path.dirname(config.model_dir or "."), "eval_direct")
    eces = evaluate_direct(config, out_dir, run_id=run_id, mesh=mesh,
                           subject_parallel=throughput, masked=not unmasked,
                           strategy=strategy, mc=mc, dtype=dtype,
                           layout="eval_tree" if eval_tree else "flat",
                           dispatch_chunks=dispatch_chunks,
                           fast_decoder=fast_decoder, fold_bn=fold_bn,
                           quantize=quantize,
                           quantize_skip_levels=quantize_skip)
    for subject, ece in eces.items():
        print(f"{subject}: ece={ece:.5f}")
    print(f"wrote eval CSVs to {out_dir}")


def cli():
    # mirror of rcu_tpu.eval.direct.STRATEGIES — kept literal so the jax
    # import (and backend selection) stays inside main(), after _cli's
    # -devices platform setup
    STRATEGIES = ("mc", "deterministic", "aleatoric", "ensemble",
                  "auxiliary_feat", "auxiliary_segm")
    parser = argparse.ArgumentParser(description="Direct one-pass test+eval")
    parser.add_argument("-config_file", type=str, required=True)
    parser.add_argument("-run_id", type=str, default=None)
    parser.add_argument("-out_dir", type=str, default=None)
    parser.add_argument("-devices", type=int, default=None)
    parser.add_argument("-strategy", type=str, default=None,
                        choices=list(STRATEGIES),
                        help="evaluation protocol (default: auto-detect "
                             "from the checkpoint and config)")
    parser.add_argument("-mc", type=int, default=None,
                        help="MC-dropout sample count (default others.mc "
                             "or 20; 0 = deterministic protocol)")
    parser.add_argument("-dtype", type=str, default=None,
                        help="compute dtype override, e.g. bfloat16 (the "
                             "production dtype; params stay f32 — parity "
                             "gated by tests/test_bf16_parity.py)")
    parser.add_argument("-throughput", action="store_true",
                        help="whole subjects round-robin across devices "
                             "(fastest testset wall clock) instead of "
                             "sharding each volume (fastest single answer)")
    parser.add_argument("-unmasked", action="store_true",
                        help="skip the BraTS t2>0 foreground mask (the ISIC "
                             "convention)")
    parser.add_argument("-dispatch_chunks", type=int, default=4,
                        help="native-2D only: K-image chunks scanned per "
                             "dispatch (round-trip amortization on remote "
                             "links; the MC stream is invariant to this)")
    parser.add_argument("-fast_decoder", action="store_true",
                        help="concat-free + fused-upsample U-Net decoder "
                             "(same checkpoints; accumulation-order "
                             "numerics — the bf16 opt-in bar)")
    parser.add_argument("-fold_bn", action="store_true",
                        help="fold BatchNorms into their convs at load "
                             "(deterministic single-forward protocols "
                             "only — not mc): removes the BN ops whose "
                             "f32 stats otherwise promote the whole "
                             "activation to f32 under -dtype bfloat16 "
                             "(same checkpoints; weight-rounding "
                             "numerics — gated by tests/test_fold_bn.py)")
    parser.add_argument("-quantize", action="store_true",
                        help="int8 PTQ trunk (mc/deterministic only): "
                             "calibrates activation scales on the first "
                             "test batch, runs trunk convs in int8 on the "
                             "MXU's 2x mode (same checkpoints; gated at "
                             "1e-3 by tests/test_quant.py)")
    parser.add_argument("-quantize_skip", type=int, default=None,
                        help="with -quantize: keep the N finest resolution "
                             "levels in the compute dtype (default: the "
                             "measured production default, ops/quant."
                             "DEFAULT_SKIP_LEVELS — int8 loses to bf16 at "
                             "the full-resolution small-channel level)")
    parser.add_argument("-eval_tree", action="store_true",
                        help="write the staged eval-dir layout "
                             "(calibration/ ece*/ uncertainty/ minmax/ "
                             "subdirs) so the analysis tables read out_dir "
                             "directly")
    args = parser.parse_args()
    if args.quantize_skip is not None and not args.quantize:
        parser.error("-quantize_skip only applies with -quantize")
    main(args.config_file, args.run_id, args.out_dir, args.devices,
         args.throughput, args.unmasked, args.strategy, args.mc, args.dtype,
         args.eval_tree, args.dispatch_chunks, args.fast_decoder,
         args.fold_bn, args.quantize, args.quantize_skip)


if __name__ == "__main__":
    cli()
