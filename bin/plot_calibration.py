"""Reliability diagrams: dataset-level count-weighted + per-subject, plus the
over/under-confidence percentages (reference bin-analysis/plot_calibration.py).
"""
import argparse
import collections
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.analysis import frames, resultdata as resdata  # noqa: E402

BRATS_SUBJECTS = ["Brats18_TCIA01_390_1", "Brats18_CBICA_AUN_1",
                  "Brats18_CBICA_ASY_1"]
ISIC_SUBJECTS = ["ISIC_0012388", "ISIC_0012654", "ISIC_0012447"]


def load_calibration_df(task: str):
    if task == "brats":
        data = resdata.BratsResultData()
        ids_names = collections.OrderedDict(resdata.brats_selection_id_name_dict)
    else:
        data = resdata.IsicResultData()
        ids_names = collections.OrderedDict(resdata.isic_selection_id_name_dict)
    files, file_ids, _, _ = data.get_files(list(ids_names), [dirs.CALIB_NAME])
    if not files:
        raise SystemExit(
            f"no calibration CSVs found for {task} — run bin/eval_uncertainty.py "
            "with the 'calib' action first")
    df = pd.concat([pd.read_csv(f) for f in files], keys=file_ids,
                   names=["run_id"])
    return df, ids_names


def plot_all_runs(df, ids_names, out_dir, task, legend=False):
    fig, ax = plt.subplots(figsize=(8, 6))
    plt.xlabel("confidence", fontsize=18)
    plt.ylabel("accuracy", fontsize=18)
    ax.plot([0, 1], [0, 1], "--", color="Black")
    for run_id, name in ids_names.items():
        if run_id not in df.index.get_level_values(0):
            continue
        group = df.loc[run_id]
        avg_conf, pos_frac, _ = frames.dataset_level_reliability(group)
        ax.plot(np.ma.compressed(avg_conf), np.ma.compressed(pos_frac), "-",
                label=name)
    ax.tick_params(axis="both", which="major", labelsize=14)
    if legend:
        plt.legend()
    plt.savefig(os.path.join(out_dir, f"summary_all_{task}.svg"),
                bbox_inches="tight")
    plt.close(fig)


def plot_subjects(df, ids_names, subjects, out_dir, legend=False):
    for subject_name in subjects:
        group = df.loc[df["subject_name"] == subject_name]
        if group.empty:
            continue
        fig, ax = plt.subplots(figsize=(8, 6))
        plt.xlabel("confidence", fontsize=18)
        plt.ylabel("accuracy", fontsize=18)
        ax.plot([0, 1], [0, 1], "--", color="Black")
        for run_id, name in ids_names.items():
            if run_id not in group.index.get_level_values(0):
                continue
            conf, frac, _ = frames.get_bins(group.loc[run_id])
            ax.plot(np.ma.compressed(conf), np.ma.compressed(frac), "-",
                    label=name)
        if legend:
            plt.legend()
        ax.tick_params(axis="both", which="major", labelsize=14)
        plt.savefig(os.path.join(out_dir, f"subject_{subject_name}.svg"),
                    bbox_inches="tight")
        plt.close(fig)


def save_legend(ids_names, out_dir):
    fig_legend = plt.figure(figsize=(11.5, 0.5))
    fig, ax = plt.subplots()
    bars = [ax.plot(range(2), range(2), label=name)[0]
            for name in ids_names.values()]
    fig_legend.legend(bars, list(ids_names.values()), loc="center",
                      ncol=len(ids_names), frameon=False)
    fig_legend.savefig(os.path.join(out_dir, "legend.svg"), bbox_inches="tight")
    plt.close("all")


def miscalibration_percentage(df, ids_names, task):
    """Signed calibration error -> over/under/well-calibrated subject ratios
    (reference plot_calibration.py:47-84)."""
    voxelwise = []
    for run_id in ids_names:
        if run_id not in df.index.get_level_values(0):
            continue
        conf, frac, counts = frames.get_bins(df.loc[run_id])
        bin_sum = counts.sum(axis=0)
        avg_conf = np.ma.compressed((conf * counts).sum(axis=0) / bin_sum)
        pos_frac = np.ma.compressed((frac * counts).sum(axis=0) / bin_sum)
        voxelwise.append((pos_frac - avg_conf).mean())

    threshold = np.percentile(np.asarray(voxelwise), 90)

    subjectwise = []
    for _, group in df.groupby("subject_name"):
        run_errors = []
        for run_id in ids_names:
            if run_id not in group.index.get_level_values(0):
                continue
            conf, frac, _ = frames.get_bins(group.loc[run_id])
            run_errors.append((frac - conf).mean())
        if run_errors:  # a subject can miss runs (partial eval) — keep the
            subjectwise.append(np.mean(run_errors))  # rows ragged-safe
    calib_mean = np.asarray(subjectwise)

    under = (calib_mean > threshold).mean()
    over = (calib_mean < -threshold).mean()
    well = np.logical_and(calib_mean <= threshold,
                          calib_mean >= -threshold).mean()
    print(f"[{task}] overall_err:{threshold:.3f} \t overconfident: {over:.2f} "
          f"\t underconfident: {under:.2f} \t well-calibrated: {well:.2f}")
    return over, under, well


def main(dataset: str):
    if dataset not in ("brats", "isic"):
        raise ValueError('dataset must be "isic" or "brats"')
    df, ids_names = load_calibration_df(dataset)
    if dataset == "brats":
        subjects = BRATS_SUBJECTS
        out_dir = os.path.join(dirs.BRATS_PLOT_DIR, dirs.CALIB_NAME)
    else:
        subjects = ISIC_SUBJECTS
        out_dir = os.path.join(dirs.ISIC_PLOT_DIR, dirs.CALIB_NAME)
    os.makedirs(out_dir, exist_ok=True)
    plot_all_runs(df, ids_names, out_dir, dataset)
    plot_subjects(df, ids_names, subjects, out_dir)
    save_legend(ids_names, out_dir)
    miscalibration_percentage(df, ids_names, dataset)


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ds", type=str, nargs="?", default="brats")
    args = parser.parse_args()
    main(args.ds)


if __name__ == "__main__":
    cli()
