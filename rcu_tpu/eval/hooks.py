"""Eval CSV hooks with the reference's exact file schemas
(rechun/eval/hook.py:10-116).

Column contracts the analysis layer depends on:
- array results unfold into zero-padded indexed columns
  ``{key}_{i:0{nb_digits}d}`` (e.g. ``bins_count_00`` .. ``bins_count_09``);
- bins CSVs re-expand masked bins to the fixed 10 columns with zeros;
- summary (minmax) CSVs have header ``confidence_entry,min,max`` and one row.
"""
from __future__ import annotations

import csv
import os

import numpy as np


class EvalHook:
    def on_run_start(self, run_id: str):
        pass

    def on_subject(self, results: dict, subject_name: str, run_id: str):
        pass

    def on_run_end(self, results_history: dict, run_id: str):
        pass


class WriteCsvHook(EvalHook):
    def __init__(self, file_path: str, entries=None):
        self.file_path = file_path
        self.rows = []
        self.entries = None if entries is None else list(entries)
        self.header = None

    @staticmethod
    def _unfold_results(results: dict) -> dict:
        unfolded = {}
        for key, value in results.items():
            if isinstance(value, np.ndarray):
                value = value.tolist()
            if isinstance(value, (list, tuple)):
                nb_digits = len(str(len(value)))
                for i, v in enumerate(value):
                    unfolded[f"{key}_{i:0{nb_digits}d}"] = v
            else:
                unfolded[key] = value
        return unfolded

    def on_subject(self, results: dict, subject_name: str, run_id: str):
        results = self._unfold_results(results)
        if self.entries is None:
            self.entries = list(results.keys())
        if self.header is None:
            self.header = ["test_id", "subject_name"] + self.entries
        missing = [e for e in self.entries if e not in results]
        if missing:
            # a dropped entry would silently shift every later column of the
            # row against the header — fail loudly instead
            raise KeyError(
                f"subject '{subject_name}' is missing result entries {missing} "
                f"required by the CSV header of {self.file_path}")
        self.rows.append([run_id, subject_name]
                         + [results[e] for e in self.entries])

    def on_run_end(self, results_history: dict, run_id: str):
        os.makedirs(os.path.dirname(self.file_path), exist_ok=True)
        with open(self.file_path, "w", newline="") as f:
            writer = csv.writer(f)
            # zero-subject runs still write the contracted entry columns so
            # downstream pd.read_csv consumers see an empty frame, not a
            # KeyError on a structurally-wrong header
            writer.writerow(self.header or (["test_id", "subject_name"]
                                            + (self.entries or [])))
            writer.writerows(self.rows)


class WriteBinsCsvHook(WriteCsvHook):
    """Re-expand nonzero-masked bins to the fixed-width columns
    (reference hook.py:75-93). Our fixed-shape device kernels already emit
    full-length arrays, so expansion is only needed for compressed inputs."""

    def on_subject(self, results: dict, subject_name: str, run_id: str):
        non_zero = np.asarray(results["bins_non_zero"])
        for key in ("bins_count", "bins_avg_confidence", "bins_positive_fraction"):
            value = np.asarray(results[key])
            if value.shape != non_zero.shape:  # compressed -> expand
                expanded = np.zeros_like(non_zero, dtype=value.dtype)
                expanded[non_zero] = value
                results[key] = expanded
            else:
                results[key] = value
        super().on_subject(results, subject_name, run_id)


class WriteSummaryCsvHook(EvalHook):
    def __init__(self, file_path: str, entries=("min", "max"),
                 summary_fn=(np.min, np.max), confidence_entry="probabilities"):
        if len(entries) != len(summary_fn):
            raise ValueError("entries and summary_fn must be of same length")
        self.file_path = file_path
        self.entries = list(entries)
        self.summary_fn = list(summary_fn)
        self.confidence_entry = confidence_entry

    def on_run_end(self, results_history: dict, run_id: str):
        os.makedirs(os.path.dirname(self.file_path), exist_ok=True)
        with open(self.file_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["confidence_entry"] + self.entries)
            summary = [fn(results_history[e])
                       for e, fn in zip(self.entries, self.summary_fn)]
            writer.writerow([self.confidence_entry] + summary)
