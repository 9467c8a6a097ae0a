"""ISIC split-JSON maker — the three paper split products as declarative
recipes over :mod:`rcu_tpu.data.split` (counterpart of reference
scripts/create_isic_subtrain_split.py; filenames, seeds and JSON bytes are
frozen contracts, the structure is this project's recipe table).

Products (over the preprocessed ISIC training subjects):
- ``ensemble``       k=10 train-only jackknife folds (the 10 ensemble members)
- ``k-fold``         k=5 cross-validation, where each fold's validation set
                     doubles as its test set
- ``resplit-train``  the 10% sub-train subset drawn after a seed-100 shuffle
                     (an isolated ``random.Random`` stream, so the caller's
                     global RNG is untouched — same bytes as the paper's
                     getstate/seed/setstate dance)
"""
import argparse
import os
import random
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, "") and REPO_ROOT not in sys.path:
    # bare-checkout script mode (python scripts/<name>.py); installed, this
    # module is rcu_tpu.tools.<name> and needs no path setup
    sys.path.insert(0, REPO_ROOT)

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.data import split as split_lib  # noqa: E402
from rcu_tpu.data.collector import IsicCollector  # noqa: E402


def _jackknife_members(names):
    """k=10 leave-one-fold-out training sets; no validation or test."""
    k = 10
    train_folds = [t for t, _ in split_lib.split_subjects_k_fold(names, k)]
    filename = f"split_isic-train_k{k}_{len(train_folds[0])}-0-0.json"
    return filename, train_folds, k * [None], None


def _cross_validation(names):
    """k=5 CV; per fold, validation == test (the paper's cv protocol)."""
    k = 5
    folds = split_lib.split_subjects_k_fold(names, k)
    train_folds = [t for t, _ in folds]
    valid_folds = [v for _, v in folds]
    nb_valid = len(names) // k
    filename = (f"split_isic_cv_k{k}_"
                f"{len(names) - nb_valid}-{nb_valid}-{nb_valid}.json")
    return filename, train_folds, valid_folds, valid_folds


def _subtrain_tenth(names):
    """First 10% of a seed-100 shuffle as the reduced training set."""
    shuffled = list(names)
    random.Random(100).shuffle(shuffled)
    nb_sub = int(len(shuffled) * 0.10)
    sub_train, _ = split_lib.split_subjects(
        shuffled, (nb_sub, len(shuffled) - nb_sub))
    return f"split_isic_sub_{nb_sub}-0-0.json", sub_train, [None], None


RECIPES = {
    "ensemble": _jackknife_members,
    "k-fold": _cross_validation,
    "resplit-train": _subtrain_tenth,
}


def main(split_type: str, data_dir: str = None, out_dir: str = None):
    try:
        recipe = RECIPES[split_type]
    except KeyError:
        raise ValueError(f'invalid split type "{split_type}"') from None

    data_dir = data_dir or dirs.ISIC_PREPROCESSED_TRAIN_DATA_DIR
    out_dir = out_dir or dirs.SPLITS_DIR
    os.makedirs(out_dir, exist_ok=True)

    names = [sf.subject for sf in
             IsicCollector(data_dir, with_superpixels=True)
             .get_subject_files()]
    filename, train, valid, test = recipe(names)
    split_lib.save_split(os.path.join(out_dir, filename), train, valid, test)
    print(f"wrote {filename}")


def cli():
    parser = argparse.ArgumentParser(description="ISIC split file creation")
    parser.add_argument("--type", type=str, default="k-fold",
                        choices=sorted(RECIPES))
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args()
    print(f"split type: {args.type}")
    main(args.type, args.data_dir, args.out_dir)


if __name__ == "__main__":
    cli()
