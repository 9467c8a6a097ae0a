"""Create the ISIC split JSONs (reference scripts/create_isic_subtrain_split.py).

Modes: ensemble (k=10 train-only jackknife) | k-fold (k=5 CV, valid==test) |
resplit-train (10% sub-train, seed 100 shuffle).
"""
import argparse
import os
import random
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.data import split as split_lib  # noqa: E402
from rcu_tpu.data.collector import IsicCollector  # noqa: E402


def main(split_type: str, data_dir: str = None, out_dir: str = None):
    if split_type not in ("ensemble", "k-fold", "resplit-train"):
        raise ValueError(f'invalid split type "{split_type}"')

    data_dir = data_dir or dirs.ISIC_PREPROCESSED_TRAIN_DATA_DIR
    out_dir = out_dir or dirs.SPLITS_DIR
    os.makedirs(out_dir, exist_ok=True)

    subject_files = IsicCollector(data_dir, with_superpixels=True).get_subject_files()
    train_names = [sf.subject for sf in subject_files]

    if split_type == "ensemble":
        k = 10
        folds = split_lib.split_subjects_k_fold(train_names, k)
        train_k = [t for t, _ in folds]
        name = f"split_isic-train_k{k}_{len(train_k[0])}-0-0.json"
        split_lib.save_split(os.path.join(out_dir, name), train_k,
                             k * [None], None)
    elif split_type == "k-fold":
        k = 5
        folds = split_lib.split_subjects_k_fold(train_names, k)
        train_k = [t for t, _ in folds]
        valid_k = [v for _, v in folds]
        nb_v = len(train_names) // k
        name = f"split_isic_cv_k{k}_{len(train_names) - nb_v}-{nb_v}-{nb_v}.json"
        split_lib.save_split(os.path.join(out_dir, name), train_k, valid_k, valid_k)
    elif split_type == "resplit-train":
        nb_new = int(len(train_names) * 0.10)
        state = random.getstate()
        random.seed(100)
        random.shuffle(train_names)
        random.setstate(state)
        new_train, _ = split_lib.split_subjects(
            train_names, (nb_new, len(train_names) - nb_new))
        name = f"split_isic_sub_{nb_new}-0-0.json"
        split_lib.save_split(os.path.join(out_dir, name), new_train, [None], None)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="ISIC split file creation")
    parser.add_argument("--type", type=str, default="k-fold")
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args()
    print(f"split type: {args.type}")
    main(args.type, args.data_dir, args.out_dir)
