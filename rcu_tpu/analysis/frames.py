"""Shared pandas helpers for the analysis tools.

- masked reliability-bin extraction from the calibration CSVs'
  ``bins_*_00..09`` columns (reference bin-analysis/plot_calibration.py:153-169);
- vectorized error precision/recall with the 0/0 -> 1 conventions
  (reference rechun/eval/helper.py:58-71);
- threshold parsing of uncertainty CSV run ids.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def get_bins(df: pd.DataFrame):
    """(avg_confidence, positive_fraction, counts) as masked arrays over the
    fixed 10-bin columns, masked where bins_non_zero is False."""
    conf = df.loc[:, "bins_avg_confidence_00":"bins_avg_confidence_09"].values
    frac = df.loc[:, "bins_positive_fraction_00":"bins_positive_fraction_09"].values
    nonzero = df.loc[:, "bins_non_zero_00":"bins_non_zero_09"].values
    if nonzero.dtype != bool:
        nonzero = nonzero.astype(str) == "True"
    counts = df.loc[:, "bins_count_00":"bins_count_09"].values.astype(float)
    mask = ~nonzero
    return (np.ma.array(conf, mask=mask), np.ma.array(frac, mask=mask),
            np.ma.array(counts, mask=mask))


def pandas_error_recall(fp, fn, fpu, fnu):
    undef = ((fnu + fpu) == 0) & ((fn + fp) == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        result = (fnu + fpu) / (fn + fp)
    result = result.astype(float)
    result[undef] = 1.0
    return result


def pandas_error_precision(tpu, tnu, fpu, fnu):
    undef = ((fnu + fpu) == 0) & ((fnu + fpu + tpu + tnu) == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        result = (fnu + fpu) / (fnu + fpu + tpu + tnu)
    result = result.astype(float)
    result[undef] = 1.0
    return result


def threshold_from_run_id(run_id: str) -> float:
    """Decode the trailing 3-digit threshold code of a ``<id>_thXXX`` run id
    (the eval passes format thresholds as ``f"{t:.2f}".replace(".", "")`` —
    the ONE place this filename contract is decoded)."""
    return float(run_id[-3:]) / 100


def concat_threshold_frames(data):
    """data: iterable of (id_, file_path, threshold-str) -> one df with a
    run_id index level '<id>_th<threshold>' and a float 'threshold' column."""
    run_ids, frames = [], []
    for id_, file_path, threshold in data:
        frames.append(pd.read_csv(file_path))
        run_ids.append(f"{id_}_th{threshold}")
    df = pd.concat(frames, keys=run_ids, names=["run_id"])
    thresholds = [threshold_from_run_id(s)
                  for s in df.index.get_level_values(0)]
    df["threshold"] = pd.Series(thresholds, index=df.index)
    return df


def dataset_level_reliability(group: pd.DataFrame):
    """Count-weighted dataset-level reliability curve + per-subject ECE
    re-verification (reference plot_calibration.py:126-143). Returns
    (avg_conf, pos_frac, per_subject_ece)."""
    conf, frac, counts = get_bins(group)
    bin_sum = counts.sum(axis=0)
    avg_conf = (conf * counts).sum(axis=0) / bin_sum
    pos_frac = (frac * counts).sum(axis=0) / bin_sum
    proportions = counts / counts.sum(axis=1, keepdims=True)
    ece = (np.abs(conf - frac) * proportions).sum(axis=1)
    if not np.allclose(np.asarray(ece), group["ece"].values, atol=1e-5):
        raise AssertionError("CSV ece does not match bins-recomputed ece")
    return avg_conf, pos_frac, ece
