"""Indexing + selection strategies over the subject store, with cached indices.

Parity targets:
- pymia SliceIndexing / PatchWiseIndexing / EmptyIndexing and the selection
  strategies consumed via ``common/trainloop/factory.py:62-83``;
- the crc32-keyed JSON index cache ``common/data/selectionhelper.py:21-41``
  (same key recipe: dataset basename + sorted subjects + repr(indexing) +
  repr(selection), cached under ``<dataset_dir>/indices/<crc32>.json``).

An index is a pair ``(subject_index, slice_index)`` (slice_index -1 for whole
-subject/empty indexing). Selection strategies prefilter non-informative
slices on the host once; training then samples uniformly from the cached list.
"""
from __future__ import annotations

import json
import logging
import os
import zlib

import numpy as np

from rcu_tpu.data.h5 import SubjectDataset


class SliceIndexing:
    """One index per (subject, z-slice)."""

    def indices_for(self, dataset: SubjectDataset, subject_idx: int):
        subject = dataset.subjects[subject_idx]
        nb_slices = dataset.shape(subject)[0]
        return [(subject_idx, z) for z in range(nb_slices)]

    def __repr__(self):
        return "SliceIndexing()"


class EmptyIndexing:
    """One index per subject (whole-volume extraction)."""

    def indices_for(self, dataset: SubjectDataset, subject_idx: int):
        return [(subject_idx, -1)]

    def __repr__(self):
        return "EmptyIndexing()"


class PatchWiseIndexing:
    """One index per (subject, slice, patch) over a 2D patch grid."""

    def __init__(self, patch_shape):
        self.patch_shape = tuple(patch_shape)

    def indices_for(self, dataset: SubjectDataset, subject_idx: int):
        subject = dataset.subjects[subject_idx]
        shape = dataset.shape(subject)
        z, y, x = shape[0], shape[1], shape[2]
        py, px = self.patch_shape
        out = []
        grid_y, grid_x = -(-y // py), -(-x // px)
        for zi in range(z):
            for gy in range(grid_y):
                for gx in range(grid_x):
                    out.append((subject_idx, zi * grid_y * grid_x + gy * grid_x + gx))
        return out

    def __repr__(self):
        return f"PatchWiseIndexing(patch_shape={self.patch_shape})"


class NoneBlackSelection:
    """Keep slices whose selected category has any non-minimum voxel
    (pymia NonBlackSelection parity: drops all-black slices)."""

    def __init__(self, category: str = "images", black: float = 0.0):
        self.category = category
        self.black = black

    def keep(self, arrays: dict) -> bool:
        return bool(np.any(arrays[self.category] > self.black))

    def __repr__(self):
        return f"NoneBlackSelection(category={self.category!r}, black={self.black})"


class WithForegroundSelection:
    """Keep slices whose labels contain foreground."""

    def __init__(self, category: str = "labels"):
        self.category = category

    def keep(self, arrays: dict) -> bool:
        return bool(np.any(arrays[self.category]))

    def __repr__(self):
        return f"WithForegroundSelection(category={self.category!r})"


class ComposeSelection:
    def __init__(self, selections):
        self.selections = list(selections)

    def keep(self, arrays: dict) -> bool:
        return all(s.keep(arrays) for s in self.selections)

    def __repr__(self):
        return "ComposeSelection({})".format(", ".join(repr(s) for s in self.selections))


def all_indices(dataset: SubjectDataset, indexing) -> list:
    out = []
    for si in range(len(dataset.subjects)):
        out.extend(indexing.indices_for(dataset, si))
    return out


def select_indices(dataset: SubjectDataset, indexing, selection,
                   categories=("images",)) -> list:
    """Filter slice indices by a selection strategy (host-side, one pass)."""
    out = []
    for si, subject in enumerate(dataset.subjects):
        vols = {c: dataset.read_volume(subject, c) for c in categories}
        for _, z in indexing.indices_for(dataset, si):
            if z < 0:
                arrays = vols
            else:
                arrays = {c: v[z] for c, v in vols.items()}
            if selection.keep(arrays):
                out.append((si, z))
    return out


def calculate_or_load_indices(dataset: SubjectDataset, indexing, selection,
                              categories=("images",)) -> list:
    """crc32-keyed JSON cache of selection results (selectionhelper.py:21-41)."""
    to_hash = (os.path.basename(dataset.dataset_path)
               + "".join(sorted(dataset.subject_subset))
               + repr(indexing) + repr(selection))
    crc32 = hex(zlib.crc32(bytes(to_hash, encoding="utf-8")) & 0xFFFFFFFF)

    indices_dir = os.path.join(os.path.dirname(dataset.dataset_path), "indices")
    file_path = os.path.join(indices_dir, f"{crc32}.json")
    if os.path.exists(file_path):
        with open(file_path, "r") as f:
            return [tuple(i) for i in json.load(f)["indices"]]

    logging.info("\t- need to calculate indices: %r", selection)
    indices = select_indices(dataset, indexing, selection, categories)
    os.makedirs(indices_dir, exist_ok=True)
    with open(file_path, "w") as f:
        json.dump({"indices": [list(i) for i in indices]}, f)
    logging.info("\t- written to file %s", file_path)
    return indices
