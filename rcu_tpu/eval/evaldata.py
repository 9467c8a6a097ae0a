"""Evaluation-run registry (reference rechun/eval/evaldata.py:9-103).

Maps the 8 strategy ids to their prediction dirs + confidence entry
('probabilities' | 'confidence' | 'sigma'), joins ground-truth collectors with
prediction collectors, and asserts the prediction set equals the test split.
"""
from __future__ import annotations

import os
import typing

from rcu_tpu import directories as dirs
from rcu_tpu.data import collector as collect
from rcu_tpu.data import split as split_lib


class EvalData:
    def __init__(self, id_, eval_path, confidence_entry: str = "probabilities",
                 subject_files=None):
        self.id_ = id_
        self.eval_path = eval_path
        self.confidence_entry = confidence_entry
        self.subject_files = subject_files if subject_files is not None else []


def _registry(predict_dir, names):
    out = {}
    for key, (sub_dir, entry) in names.items():
        out[key] = EvalData(key, os.path.join(predict_dir, sub_dir), entry)
    return out


def brats_eval_data():
    return _registry(dirs.BRATS_PREDICT_DIR, {
        "baseline": (dirs.BRATS_BASELINE_PREDICT, "probabilities"),
        "baseline_mc": (dirs.BRATS_BASELINE_MC_PREDICT, "probabilities"),
        "center": (dirs.BRATS_CENTER_PREDICT, "probabilities"),
        "center_mc": (dirs.BRATS_CENTER_MC_PREDICT, "probabilities"),
        "ensemble": (dirs.BRATS_ENSEMBLE_PREDICT, "probabilities"),
        "auxiliary_feat": (dirs.BRATS_AUX_FEAT_PREDICT, "confidence"),
        "auxiliary_segm": (dirs.BRATS_AUX_SEGM_PREDICT, "confidence"),
        "aleatoric": (dirs.BRATS_ALEATORIC_PREDICT, "sigma"),
    })


def isic_eval_data():
    return _registry(dirs.ISIC_PREDICT_DIR, {
        "baseline": (dirs.ISIC_BASELINE_PREDICT, "probabilities"),
        "baseline_mc": (dirs.ISIC_BASELINE_MC_PREDICT, "probabilities"),
        "center": (dirs.ISIC_CENTER_PREDICT, "probabilities"),
        "center_mc": (dirs.ISIC_CENTER_MC_PREDICT, "probabilities"),
        "ensemble": (dirs.ISIC_ENSEMBLE_PREDICT, "probabilities"),
        "auxiliary_feat": (dirs.ISIC_AUX_FEAT_PREDICT, "confidence"),
        "auxiliary_segm": (dirs.ISIC_AUX_SEGM_PREDICT, "confidence"),
        "aleatoric": (dirs.ISIC_ALEATORIC_PREDICT, "sigma"),
    })


def get_brats_data(eval_data: typing.Union[EvalData, list],
                   in_dir: str = None, split_file: str = None):
    """Join GT collector + prediction collectors; assert set == test split
    (reference evaldata.py:55-79)."""
    in_dir = in_dir or dirs.BRATS_ORIG_DATA_DIR
    split_file = split_file or os.path.join(dirs.SPLITS_DIR,
                                            "split_brats18_100-25-160.json")
    was_list = True
    if isinstance(eval_data, EvalData):
        was_list, eval_data = False, [eval_data]

    gt_subject_files = collect.Brats17Collector(in_dir).get_subject_files()
    _, _, test_subjects = split_lib.load_split(split_file)

    for entry in eval_data:
        prediction_collector = collect.PostfixPredictionCollector(
            entry.eval_path, ["prediction", entry.confidence_entry],
            ["labels", "misc"])
        prediction_subject_files = prediction_collector.get_subject_files()
        combined = collect.combine(gt_subject_files, prediction_subject_files)
        assert set(test_subjects) == set(sf.subject for sf in combined)
        entry.subject_files = combined
    return eval_data if was_list else eval_data[0]


def get_isic_data(eval_data: typing.Union[EvalData, list], in_dir: str = None):
    in_dir = in_dir or dirs.ISIC_PREPROCESSED_TEST_DATA_DIR
    was_list = True
    if isinstance(eval_data, EvalData):
        was_list, eval_data = False, [eval_data]

    gt_subject_files = collect.IsicCollector(in_dir).get_subject_files()
    for entry in eval_data:
        prediction_collector = collect.PostfixPredictionCollector(
            entry.eval_path, ["prediction", entry.confidence_entry],
            ["labels", "misc"])
        prediction_subject_files = prediction_collector.get_subject_files()
        combined = collect.combine(gt_subject_files, prediction_subject_files)
        assert set(sf.subject for sf in gt_subject_files) == \
            set(sf.subject for sf in combined)
        entry.subject_files = combined
    return eval_data if was_list else eval_data[0]


def get_brats_eval_data(to_eval: list, **kw):
    reg = brats_eval_data()
    return get_brats_data([reg[e] for e in to_eval], **kw)


def get_isic_eval_data(to_eval: list, **kw):
    reg = isic_eval_data()
    return get_isic_data([reg[e] for e in to_eval], **kw)
