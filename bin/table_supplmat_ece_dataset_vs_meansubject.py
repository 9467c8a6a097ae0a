"""Dataset-pooled ECE vs mean-subject ECE table
(reference bin-analysis/table_supplmat_ece_dataset_vs_meansubject.py).
"""
import argparse
import collections

import numpy as np
import pandas as pd

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs
from rcu_tpu.analysis import frames, resultdata as resdata


def dataset_vs_mean_subject_ece(df: pd.DataFrame, ids_names) -> pd.DataFrame:
    def per_run(frame):
        conf, frac, counts = frames.get_bins(frame)
        bin_sum = counts.sum(axis=0)
        avg_conf = (conf * counts).sum(axis=0) / bin_sum
        pos_frac = (frac * counts).sum(axis=0) / bin_sum
        proportions = counts / counts.sum(axis=1, keepdims=True)
        ece = (np.abs(conf - frac) * proportions).sum(axis=1)
        assert np.allclose(np.asarray(ece), frame["ece"].values, atol=1e-5)
        ds_ece = (np.abs(avg_conf - pos_frac) * bin_sum / bin_sum.sum()).sum()
        return pd.Series({"ece": ece.mean(), "ds_ece": float(ds_ece)})

    pd_version = tuple(int(p) for p in pd.__version__.split(".")[:2])
    out = df.groupby("test_id").apply(per_run, include_groups=False) \
        if pd_version >= (2, 2) else df.groupby("test_id").apply(per_run)
    return out.reindex(list(ids_names)).rename(index=ids_names)


def gather(task: str) -> pd.DataFrame:
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
    # group key is the CSV's own test_id column; make sure it exists
    return dataset_vs_mean_subject_ece(df, ids_names)


def main():
    parts = []
    for task in ("brats", "isic"):
        try:
            part = gather(task)
            part = (part * 100).round(3)  # percent
            parts.append(part)
        except Exception as e:  # missing results for one dataset is fine
            print(f"skipping {task}: {e}")
    if parts:
        combined = pd.concat(parts, axis=1,
                             keys=["brats", "isic"][: len(parts)])
        print(combined.to_latex())
        return combined


def cli():
    argparse.ArgumentParser(description="ece dataset vs mean-subject").parse_args()
    main()


if __name__ == "__main__":
    cli()
