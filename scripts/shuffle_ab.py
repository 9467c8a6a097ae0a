"""Chunked-shuffle convergence A/B + shuffle-quality measurement.

The 8-chip training feed depends on the ``shuffle_chunk`` data-config
opt-in (``data/loader.py``): shuffled chunks of consecutive slices keep the
HDF5 reads ranged (158-168 Mvox/s vs 104 exact-uniform,
``scripts/bench_loader.py``), at chunk-granular randomness. This script
measures what that randomness trade COSTS:

1. **Convergence A/B**: train the same synthetic BraTS-like task with the
   same seeds under exact uniform shuffle vs ``shuffle_chunk in {8, 32}``
   and compare the per-epoch validation-dice trajectories.
2. **Shuffle quality**: mean within-batch subject diversity
   (unique subjects per batch / min(batch_size, n_subjects)) and the mean
   absolute displacement of each item from its unshuffled position
   (normalized by the uniform-shuffle expectation, ~n/3).

Runs on CPU (tiny model, deterministic); prints one JSON object.
Measured results are recorded in ``data/loader.py`` and the README's
8-chip feed recipe.

Usage:
  python scripts/shuffle_ab.py [--epochs 20] [--subjects 16] [--chunks 8 32]
"""
import argparse
import csv
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, "") and REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rcu_tpu import strategies  # noqa: E402
from rcu_tpu.data import h5  # noqa: E402
from rcu_tpu.data.loader import SliceBatchLoader  # noqa: E402
from rcu_tpu.data.nifti import ImageProperties  # noqa: E402
from rcu_tpu.data.split import save_split  # noqa: E402
from rcu_tpu.engine import config as cfg_lib  # noqa: E402

Z, H, W, C = 12, 32, 32, 4


def make_store(path: str, n_subjects: int, seed: int = 7) -> str:
    """Synthetic learnable task: channel-0 carries the (noisy) target blob,
    with per-subject blob positions so batch composition matters."""
    rng = np.random.RandomState(seed)
    with h5.DatasetWriter(path) as w:
        for i in range(n_subjects):
            gt = np.zeros((Z, H, W), np.uint8)
            y, x = rng.randint(4, H - 12), rng.randint(4, W - 12)
            gt[:, y:y + 8, x:x + 8] = 1
            images = rng.rand(Z, H, W, C).astype(np.float32) * 0.4
            images[..., 0] += 0.8 * gt + 0.1 * rng.rand(Z, H, W)
            w.add_subject(f"s{i:03d}", {"images": images, "labels": gt},
                          props=ImageProperties(size=(W, H, Z)))
    return path


def train_trajectory(tmp, store, split_file, shuffle_chunk: int,
                     epochs: int, batch_size: int) -> list:
    """Per-epoch mean validation dice for one shuffle mode (same seed 20)."""
    name = f"ab_chunk{shuffle_chunk}"
    cfg = cfg_lib.TrainConfiguration(
        epochs=epochs, seed=20, split=split_file,
        train_dir=os.path.join(tmp, "out"), train_name=name,
        valid_every_nth=1,
        model=cfg_lib.ParametricNode.parse(
            {"unet": {"depth": 2, "dropout": 0.1, "in_channels": C,
                      "nb_classes": 2, "start_filters": 8}}),
        optimizer=cfg_lib.ParametricNode.parse({"adam": {"lr": 0.001}}),
        train_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": batch_size, "dataset": store,
             "indexing": {"slice": {}}, "shuffle": True,
             "shuffle_chunk": shuffle_chunk}),
        valid_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": batch_size, "dataset": store,
             "indexing": {"slice": {}}, "shuffle": False}))
    loop = strategies.train_default(cfg)
    by_epoch = {}
    with open(os.path.join(loop.run_dir, "validation_metrics.csv")) as fp:
        for row in csv.DictReader(fp):
            by_epoch.setdefault(int(row["epoch"]), []).append(
                float(row["dice"]))
    return [round(float(np.mean(by_epoch[e])), 4) for e in sorted(by_epoch)]


def shuffle_quality(store, split_file, shuffle_chunk: int, batch_size: int,
                    n_subjects: int, epochs: int = 5) -> dict:
    """Order statistics of the loader's actual epoch streams (the same
    build_data construction the training loop uses)."""
    from rcu_tpu.data.split import load_split
    from rcu_tpu.engine import databuild
    train_subjects, _, _ = load_split(split_file)
    data = databuild.build_data(
        cfg_lib.DataConfiguration.from_dict(
            {"batch_size": batch_size, "dataset": store,
             "indexing": {"slice": {}}, "shuffle": True,
             "shuffle_chunk": shuffle_chunk}),
        subjects=train_subjects, seed=20)
    loader = data.loader
    n = len(loader.indices)
    diversity, displacement = [], []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        order = np.asarray(loader._epoch_order())
        displacement.append(float(np.mean(np.abs(order - np.arange(n)))))
        for lo in range(0, n, batch_size):
            rows = [loader.indices[i] for i in order[lo:lo + batch_size]]
            subjects = {r[0] for r in rows}
            diversity.append(len(subjects)
                             / min(batch_size, n_subjects, len(rows)))
    return {
        "within_batch_subject_diversity": round(float(np.mean(diversity)), 3),
        # 1.0 ~= uniform shuffle (expected |i - pi(i)| = n/3); 0 = unshuffled
        "normalized_displacement": round(
            float(np.mean(displacement)) / (n / 3.0), 3),
    }


def main(epochs: int, n_subjects: int, chunks, batch_size: int = 32):
    tmp = tempfile.mkdtemp(prefix="rcu_shuffle_ab_")
    try:
        store = make_store(os.path.join(tmp, "ds.h5"), n_subjects)
        split_file = os.path.join(tmp, "split.json")
        subjects = [f"s{i:03d}" for i in range(n_subjects)]
        n_train = max(2, int(0.75 * n_subjects))
        save_split(split_file, subjects[:n_train],
                   subjects[n_train:n_train + max(1, n_subjects // 8)],
                   subjects[n_train + max(1, n_subjects // 8):])
        out = {"epochs": epochs, "subjects": n_subjects,
               "batch_size": batch_size, "modes": {}}
        # dedupe while keeping order: chunk<=1 IS the exact-shuffle mode the
        # loop unconditionally prepends, so `--chunks 1 32` must not train
        # (and silently overwrite) the same "exact" leg twice
        seen = set()
        modes = []
        for chunk in [0] + list(chunks):
            key = "exact" if chunk <= 1 else chunk
            if key not in seen:
                seen.add(key)
                modes.append(chunk)
        for chunk in modes:
            label = "exact" if chunk <= 1 else f"chunk{chunk}"
            traj = train_trajectory(tmp, store, split_file, chunk, epochs,
                                    batch_size)
            quality = shuffle_quality(store, split_file, chunk, batch_size,
                                      n_train)
            out["modes"][label] = {
                "dice_trajectory": traj,
                "final_dice": traj[-1],
                "best_dice": max(traj),
                **quality,
            }
        exact = out["modes"]["exact"]
        for label, mode in out["modes"].items():
            mode["final_dice_delta_vs_exact"] = round(
                mode["final_dice"] - exact["final_dice"], 4)
        print(json.dumps(out))
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def cli():
    parser = argparse.ArgumentParser(
        description="chunked-shuffle convergence A/B")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--subjects", type=int, default=16)
    parser.add_argument("--chunks", type=int, nargs="*", default=[8, 32])
    args = parser.parse_args()
    main(args.epochs, args.subjects, args.chunks)


if __name__ == "__main__":
    cli()
