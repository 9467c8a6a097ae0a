"""Uncertainty-error precision/recall curves over thresholds
(reference bin-analysis/plot_supplmat_error_prec_recall.py).
"""
import argparse
import collections
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.analysis import frames, resultdata as resdata  # noqa: E402


def load_df(task: str):
    if task == "brats":
        data = resdata.BratsResultData()
        ids_names = collections.OrderedDict(resdata.brats_selection_id_name_dict)
    else:
        data = resdata.IsicResultData()
        ids_names = collections.OrderedDict(resdata.isic_selection_id_name_dict)
    files, file_ids, _, file_thresholds = data.get_files(
        list(ids_names), [dirs.UNCERTAINTY_NAME])
    if not files:
        raise SystemExit(
            f"no uncertainty CSVs found for {task} — run bin/eval_uncertainty.py "
            "with the 'bnf_ue' action first")
    df = frames.concat_threshold_frames(zip(file_ids, files, file_thresholds))
    return df, ids_names


def plot_precision_recall(df, ids_names, outfile, with_legend=False):
    df = df.copy()
    df["ue_sens"] = frames.pandas_error_recall(
        df["fp"].values.astype(float), df["fn"].values.astype(float),
        df["fpu"].values.astype(float), df["fnu"].values.astype(float))
    df["ue_prec"] = frames.pandas_error_precision(
        df["tpu"].values.astype(float), df["tnu"].values.astype(float),
        df["fpu"].values.astype(float), df["fnu"].values.astype(float))

    fig, ax = plt.subplots()
    for run_id, name in ids_names.items():
        group = df[df["test_id"] == run_id].groupby("threshold")[
            ["ue_prec", "ue_sens"]].mean()
        if group.empty:
            continue
        group = group.sort_values("ue_prec").reset_index()
        group.plot("ue_prec", "ue_sens", kind="line", ax=ax, label=name,
                   marker=".", markersize=6, linewidth=0.5)
    ax.tick_params(axis="both", which="major", labelsize=12)
    if not with_legend and ax.get_legend() is not None:
        ax.get_legend().remove()
    ax.set_xlim(0.0, 0.6)
    plt.xlabel("precision", fontsize=14)
    plt.ylabel("recall", fontsize=14)
    plt.savefig(outfile)
    plt.close(fig)


def main(dataset: str):
    if dataset not in ("brats", "isic"):
        raise ValueError('dataset must be "isic" or "brats"')
    df, ids_names = load_df(dataset)
    plot_dir = dirs.BRATS_PLOT_DIR if dataset == "brats" else dirs.ISIC_PLOT_DIR
    out_dir = os.path.join(plot_dir, "suppl_mat")
    os.makedirs(out_dir, exist_ok=True)
    plot_precision_recall(df, ids_names,
                          os.path.join(out_dir, f"error_prec_recall_{dataset}.svg"))


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ds", type=str, nargs="?", default="brats")
    args = parser.parse_args()
    main(args.ds)


if __name__ == "__main__":
    cli()
