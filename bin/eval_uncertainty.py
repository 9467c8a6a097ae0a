"""Offline uncertainty evaluation CLI (reference bin-eval/eval_uncertainty.py).

Same flags and defaults: ``--ds {brats,isic} --ids <strategy ids> --act
{minmax,ece_dice,calib,bnf_ue}``; per run x subject the NIfTIs are loaded once
(shared cached Loader) and every action's metric pass runs as fused device
kernels.
"""
import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, ""):  # bare-checkout script mode: python bin/<name>.py
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    BIN_DIR = os.path.dirname(os.path.abspath(__file__))
    if BIN_DIR not in sys.path:
        sys.path.insert(0, BIN_DIR)

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.eval import actions as act_lib  # noqa: E402
from rcu_tpu.eval import analysis, evaldata as evdata  # noqa: E402

DEFAULT_IDS = ["baseline", "baseline_mc", "center", "center_mc", "ensemble",
               "auxiliary_feat", "auxiliary_segm", "aleatoric"]
DEFAULT_ACTIONS = ["minmax", "ece_dice", "calib", "bnf_ue"]


def main(dataset, to_eval, action_names, n_devices=None):
    if dataset not in ("brats", "isic"):
        raise ValueError('chose "brats" or "isic" as dataset')

    try:  # package mode: rcu_tpu.cli.* (console entry points)
        from . import _cli
    except ImportError:  # bare-checkout script mode
        import _cli
    mesh = _cli.mesh_from_devices(n_devices)

    if dataset == "brats":
        eval_data_list = evdata.get_brats_eval_data(to_eval)
        ece_details = "foreground"
        base_dir = dirs.BRATS_EVAL_DIR
    else:
        eval_data_list = evdata.get_isic_eval_data(to_eval)
        ece_details = ""
        base_dir = dirs.ISIC_EVAL_DIR

    min_max_dir = os.path.join(base_dir, dirs.MINMAX_NAME)
    actions = act_lib.get_actions(action_names, min_max_dir, base_dir,
                                  ece_details, mesh=mesh)

    for entry in eval_data_list:
        for action in actions:
            action.setup_eval(entry)
        for action in actions:
            action.start_eval()

        # host NIfTI decompression dominates the eval wall clock (the device
        # pass is ~6ms/volume); pre-warm the next subject's Loader cache in a
        # background thread while the current subject computes
        def prewarm(sf):
            loader = analysis.Loader()
            for action in actions:
                loader.get_data(sf, **action.load_spec)
            return loader

        import concurrent.futures
        subject_files = entry.subject_files
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            future = pool.submit(prewarm, subject_files[0]) if subject_files else None
            for i, sf in enumerate(subject_files):
                print(f"[{i + 1}/{len(subject_files)}] {sf.subject}",
                      end=" ", flush=True)
                loader = future.result()
                if i + 1 < len(subject_files):
                    future = pool.submit(prewarm, subject_files[i + 1])
                start = time.time()
                for action in actions:
                    action.eval_subject(sf, loader)
                print(f"({time.time() - start}s)")

        for action in actions:
            action.finish_eval()


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ds", type=str, nargs="?",
                        help="the dataset to evaluate the runs on")
    parser.add_argument("--ids", type=str, nargs="*",
                        help="the ids of the runs to be evaluated")
    parser.add_argument("--act", type=str, nargs="*",
                        help="the names of the evaluation configuration")
    parser.add_argument("--devices", type=int, default=None,
                        help="shard each subject's eval reductions over the "
                             "first N devices (default: single device)")
    args = parser.parse_args()

    ds = args.ds or "brats"
    to_evaluate = args.ids if args.ids else DEFAULT_IDS
    action_ids = args.act if args.act else DEFAULT_ACTIONS

    print("\n**************************************")
    print(f"dataset: {ds}")
    print(f"to_evaluate: {to_evaluate}")
    print(f"eval_actions: {action_ids}")
    print("**************************************\n")

    main(ds, to_evaluate, action_ids, n_devices=args.devices)


if __name__ == "__main__":
    cli()
