"""Main paper table: per-strategy mean ECE(%), best-threshold error-dice and
benefit ratio, Dice, with dense ranks and bold rank-1 LaTeX
(reference bin-analysis/table_ece_ue_bnf_dice.py).
"""
import argparse
import collections
import re

import pandas as pd

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs
from rcu_tpu.analysis import frames, resultdata as resdata

ENTRIES = ["ece", "error", "benefit", "dice"]
PRECISION = [3, 3, 2, 3]


def gather_information(task: str) -> pd.DataFrame:
    if task == "brats":
        data = resdata.BratsResultData()
        ids_names = collections.OrderedDict(resdata.brats_selection_id_name_dict)
        ece_cat = dirs.ECE_FOREGROUND_NAME
    else:
        data = resdata.IsicResultData()
        ids_names = collections.OrderedDict(resdata.isic_selection_id_name_dict)
        ece_cat = dirs.ECE_NAME

    files, file_ids, _, file_thresholds = data.get_files(
        list(ids_names), [dirs.UNCERTAINTY_NAME])
    files_ece, ids_ece, _, _ = data.get_files(list(ids_names), [ece_cat])
    ece_dict = dict(zip(ids_ece, files_ece))

    run_ids, frames_ = [], []
    for file_path, id_, threshold in zip(files, file_ids, file_thresholds):
        if id_ not in ece_dict:
            print(f"missing ece id_ {id_}")
            continue
        frame = pd.read_csv(file_path)[
            ["test_id", "subject_name", "corrected_dice", "fp", "fn", "fnu",
             "fpu", "tnu", "tpu", "dice"]]
        ece_frame = pd.read_csv(ece_dict[id_])
        assert (frame["dice"].round(5) == ece_frame["dice"].round(5)).all()
        frame = frame.drop(columns="dice")
        frame = pd.merge(frame, ece_frame[["subject_name", "ece", "dice"]],
                         on=["subject_name"])
        frames_.append(frame)
        run_ids.append(f"{id_}_th{threshold}")

    if not frames_:
        raise SystemExit(
            f"no eval CSVs found for {task} under the configured eval dir — "
            "run bin/eval_uncertainty.py first (see rcu_tpu/directories.py)")
    df = pd.concat(frames_, keys=run_ids, names=["run_id"])
    df["threshold"] = pd.Series(
        [frames.threshold_from_run_id(s)
         for s in df.index.get_level_values(0)],
        index=df.index)
    df["dice_diff"] = df["corrected_dice"] - df["dice"]
    df["benefit"] = df["dice_diff"] > 0
    df["error"] = (2 * (df["fnu"] + df["fpu"])) / (
        df["fn"] + df["fp"] + df["fnu"] + df["fpu"] + df["tnu"] + df["tpu"])

    best_benefit = get_best_thresholds(
        df[["test_id", "subject_name", "threshold", "benefit"]], "benefit"
    ).rename(columns={"threshold": "benefit_threshold"})
    best_error = get_best_thresholds(
        df[["test_id", "subject_name", "threshold", "error"]], "error"
    ).rename(columns={"threshold": "error_threshold"})

    df = df[["test_id", "subject_name", "ece", "dice"]]
    df = pd.merge(df, best_benefit, on=["test_id", "subject_name"])
    df = pd.merge(df, best_error, on=["test_id", "subject_name"])
    df = df.groupby("test_id").mean(numeric_only=True)
    return df.reindex(list(ids_names)).rename(index=ids_names)


def get_best_thresholds(df: pd.DataFrame, entry: str) -> pd.DataFrame:
    """Per strategy, the threshold whose subject-mean of ``entry`` is best."""
    best, run_ids = [], []
    for _, group in df.groupby("test_id"):
        means = group.groupby("run_id")[entry].mean()
        run_id_max = means.idxmax()
        best.append(df.loc[run_id_max])
        run_ids.append(run_id_max)
    return pd.concat(best, keys=run_ids, names=["run_id"])


def prepare_for_print(df: pd.DataFrame) -> pd.DataFrame:
    df = df.loc[:, ENTRIES].dropna(how="all").copy()
    df["ece"] = df["ece"] * 100  # percent
    for entry, prec in zip(ENTRIES, PRECISION):
        df[entry] = df[entry].round(prec)
        ascending = entry == "ece"
        df[f"{entry}_rank"] = df[entry].rank(
            method="dense", ascending=ascending).astype(int)

    out = pd.DataFrame(index=df.index)
    for entry in ENTRIES:
        out[entry] = [f"{v} ({r})" for v, r in
                      zip(df[entry], df[f"{entry}_rank"])]
    return out


def main():
    brats = prepare_for_print(gather_information("brats"))
    isic = prepare_for_print(gather_information("isic"))
    combined = pd.concat([brats, isic], axis=1, keys=["brats", "isic"])
    latex_str = combined.to_latex().replace("±", r"$\pm$")
    latex_str = re.sub(r"([0-9]*\.?[0-9]*) \(1\)",
                       r"\\textbf{\g<1>} (1)", latex_str)
    print(latex_str)
    return combined


def cli():
    argparse.ArgumentParser(description="main paper table").parse_args()
    main()


if __name__ == "__main__":
    cli()
