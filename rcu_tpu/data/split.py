"""Subject split create/save/load — exact JSON contract of the reference.

Parity target: common/data/split.py:10-117. File format is
``{"train": [...], "valid": [...], "test": [...]}`` where entries are flat
lists, or lists-of-lists for k-fold/jackknife files loaded with
``load_split(file, k)`` (reference split.py:85-93).
"""
from __future__ import annotations

import json
import os

import numpy as np
import sklearn.model_selection as model_selection


def split_subjects(subjects: list, sizes: tuple) -> tuple:
    nb_total = len(subjects)
    counts = _normalize_sizes(sizes, nb_total)
    nb_train, nb_valid = counts[0], counts[1]
    train = subjects[:nb_train]
    valid = subjects[nb_train:nb_train + nb_valid]
    ret = [train, valid]
    if len(counts) == 3:
        ret.append(subjects[-counts[2]:])
    return tuple(ret)


def split_subjects_k_fold(subjects: list, k: int) -> list:
    n = len(subjects)
    if n % k != 0:
        raise ValueError(f"Number of subjects ({n}) must be a multiple of k ({k})")
    per_fold = n // k
    splits = []
    for i in range(0, n, per_fold):
        valid = subjects[i:i + per_fold]
        train = subjects[:i] + subjects[i + per_fold:]
        splits.append((train, valid))
    return splits


def split_subject_k_fold_stratified(subjects: list, stratification: list, k: int) -> list:
    select = model_selection.StratifiedKFold(n_splits=k)
    folds = []
    for train_idx, valid_idx in select.split(subjects, stratification):
        folds.append(([subjects[i] for i in train_idx],
                      [subjects[i] for i in valid_idx]))
    return folds


def create_stratified_shuffled_split(subjects: list, stratification: list,
                                     counts: tuple, seed: int = 100):
    valid_cnt = counts[1]
    res = model_selection.train_test_split(
        subjects, stratification, test_size=valid_cnt, random_state=seed,
        shuffle=True, stratify=np.asarray(stratification))
    tt_subjects, valid_subjects = res[:2]
    tt_strat, _ = res[2:]
    if len(counts) == 3:
        train_subjects, test_subjects = model_selection.train_test_split(
            tt_subjects, test_size=counts[2], random_state=seed,
            shuffle=True, stratify=np.asarray(tt_strat))
        return train_subjects, valid_subjects, test_subjects
    return tt_subjects, valid_subjects


def save_split(file: str, train_subjects: list, valid_subjects: list,
               test_subjects: list = None):
    if os.path.exists(file):
        os.remove(file)
    with open(file, "w") as f:
        json.dump({"train": train_subjects, "valid": valid_subjects,
                   "test": test_subjects}, f)


def load_split(file: str, k: int = None):
    with open(file, "r") as f:
        d = json.load(f)
    train, valid, test = d["train"], d["valid"], d["test"]
    if k is not None:
        train, valid = train[k], valid[k]
        test = [] if test is None else test[k]
    return train, valid, test


def _normalize_sizes(sizes, nb_total):
    if isinstance(sizes[0], int):
        if nb_total != sum(sizes):
            raise ValueError(f"int sizes ({sizes}) do not sum to number of subjects ({nb_total})")
        nb_train, nb_valid = sizes[0], sizes[1]
    elif isinstance(sizes[0], float):
        if sum(sizes) != 1.0:
            raise ValueError(f"float sizes ({sizes}) do not sum up to 1")
        nb_train = int(nb_total * sizes[0])
        nb_valid = int(nb_total * sizes[1])
    else:
        raise ValueError(f"size values must be float or int, found {type(sizes[0])}")
    counts = [nb_train, nb_valid]
    if len(sizes) == 3:
        counts.append(nb_total - nb_train - nb_valid)
    return tuple(counts)
