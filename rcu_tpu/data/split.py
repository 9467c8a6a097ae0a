"""Subject-split management.

Only the on-disk JSON layout is a compatibility contract (reference
common/data/split.py:75-93): a single object with ``train`` / ``valid`` /
``test`` keys whose values are flat subject-name lists, or lists-of-lists for
fold files that are indexed with a fold number at load time.  Everything else
here — the partitioning helpers used by ``scripts/create_*_split.py`` — is
this project's own design centred on the :class:`SubjectSplit` value object.

Reproducibility note: the stratified shuffles delegate to
``sklearn.model_selection.train_test_split`` with a caller-supplied
``random_state`` so that regenerated splits are bit-equal to the vendored
JSONs in ``config/splits/`` (which were produced with seed 100).
"""
from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Sequence, Tuple

import numpy as np
import sklearn.model_selection as _ms


@dataclasses.dataclass(frozen=True)
class SubjectSplit:
    """A train/valid/test assignment of subject names.

    Members may be flat lists (a single split) or lists-of-lists (one entry
    per fold, as written by the jackknife/k-fold split makers).
    """

    train: list
    valid: list
    test: Optional[list] = None

    def fold(self, k: int) -> "SubjectSplit":
        """Select fold ``k`` from a folded split file."""
        test = [] if self.test is None else self.test[k]
        return SubjectSplit(self.train[k], self.valid[k], test)

    def save(self, path: str) -> None:
        payload = {"train": self.train, "valid": self.valid, "test": self.test}
        with open(path, "w") as fp:
            json.dump(payload, fp)

    @classmethod
    def load(cls, path: str, k: Optional[int] = None) -> "SubjectSplit":
        with open(path) as fp:
            payload = json.load(fp)
        split = cls(payload["train"], payload["valid"], payload["test"])
        return split if k is None else split.fold(k)


# ---------------------------------------------------------------------------
# Module-level façade kept for the engine/scripts call sites.

def save_split(file: str, train_subjects: list, valid_subjects: list,
               test_subjects: list = None) -> None:
    SubjectSplit(train_subjects, valid_subjects, test_subjects).save(file)


def load_split(file: str, k: int = None) -> Tuple[list, list, list]:
    s = SubjectSplit.load(file, k)
    return s.train, s.valid, s.test


# ---------------------------------------------------------------------------
# Partitioning helpers (project idiom; consumed by scripts/create_*_split.py).

def _resolve_counts(sizes: Sequence, total: int) -> List[int]:
    """Turn ``sizes`` (absolute ints or fractions) into absolute counts.

    Only a three-way split treats its trailing entry as "the remainder"; a
    two-way FRACTIONAL split floors both counts and may leave rounding
    leftovers in neither group — deliberately identical to the replaced
    implementation (use absolute sizes for exact two-way coverage).
    """
    if all(isinstance(s, int) for s in sizes):
        if sum(sizes) != total:
            raise ValueError(
                f"absolute split sizes {tuple(sizes)} must cover all "
                f"{total} subjects exactly")
        counts = list(sizes)
    elif all(isinstance(s, float) for s in sizes):
        if abs(sum(sizes) - 1.0) > 1e-12:
            raise ValueError(
                f"fractional split sizes {tuple(sizes)} must total 1.0")
        counts = [int(total * s) for s in sizes]
    else:
        raise ValueError(
            f"split sizes must be all-int or all-float, got {tuple(sizes)}")
    if len(counts) == 3:
        counts[2] = total - counts[0] - counts[1]
    return counts


def split_subjects(subjects: list, sizes: Sequence) -> tuple:
    """Partition an already-ordered subject list into consecutive groups.

    A three-way split's last group is anchored to the END of the list (so
    fractional rounding drops middle subjects, never test ones); a two-way
    split is purely consecutive — both matching the replaced implementation.
    """
    counts = _resolve_counts(sizes, len(subjects))
    groups, cursor = [], 0
    for n in counts[:-1]:
        groups.append(subjects[cursor:cursor + n])
        cursor += n
    if len(counts) == 3:
        groups.append(subjects[len(subjects) - counts[-1]:])
    else:
        groups.append(subjects[cursor:cursor + counts[-1]])
    return tuple(groups)


def split_subjects_k_fold(subjects: list, k: int) -> list:
    """Rotation k-fold: fold i holds out the i-th contiguous block."""
    if len(subjects) % k:
        raise ValueError(
            f"k-fold needs len(subjects) divisible by k, got "
            f"{len(subjects)} subjects for k={k}")
    block = len(subjects) // k
    folds = []
    for i in range(k):
        held_out = subjects[i * block:(i + 1) * block]
        kept = subjects[:i * block] + subjects[(i + 1) * block:]
        folds.append((kept, held_out))
    return folds


def split_subject_k_fold_stratified(subjects: list, stratification: list,
                                    k: int) -> list:
    """Label-stratified k-fold (deterministic sklearn StratifiedKFold)."""
    folds = []
    for kept_idx, held_idx in _ms.StratifiedKFold(n_splits=k).split(
            subjects, stratification):
        folds.append(([subjects[i] for i in kept_idx],
                      [subjects[i] for i in held_idx]))
    return folds


def create_stratified_shuffled_split(subjects: list, stratification: list,
                                     counts: Sequence, seed: int = 100):
    """Two chained stratified shuffles: carve valid off, then test off.

    Call order and arguments mirror what produced the paper's vendored split
    JSONs, so the same ``seed`` regenerates them bit-equal.
    """
    rest, valid, rest_strat, _ = _ms.train_test_split(
        subjects, stratification, test_size=counts[1], random_state=seed,
        shuffle=True, stratify=np.asarray(stratification))
    if len(counts) < 3:
        return rest, valid
    train, test = _ms.train_test_split(
        rest, test_size=counts[2], random_state=seed, shuffle=True,
        stratify=np.asarray(rest_strat))
    return train, valid, test
