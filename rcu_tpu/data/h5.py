"""HDF5 subject store — the pymia ``ParameterizableDataset`` replacement.

The reference delegates dataset storage to pymia 0.2.1 H5 files
(``common/trainloop/data.py:41-48``, ``scripts/create_brats18_dataset.py``).
This store owns the same responsibilities with a simpler layout designed for
slice-sliced TPU feeding:

  /subjects                     string dataset of subject names (ordering!)
  /data/<subject>/<category>    e.g. images (Z,Y,X,C) f32, labels (Z,Y,X) u8
  /props/<subject>              attrs: size/spacing/origin/direction
  /meta/<subject>               free-form attrs (e.g. grade), 'files/<cat>' lists

Random access is per-slice (chunked (1, Y, X, [C])) so the host loader can
gather shuffled (subject, slice) batches without reading volumes.
"""
from __future__ import annotations

import json
import os
import typing

import h5py
import numpy as np

from rcu_tpu.data.nifti import ImageProperties


class DatasetWriter:
    """Create a subject H5 store (replaces pymia creation traverser callbacks)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = h5py.File(path, "w")
        self._subjects = []

    def add_subject(self, name: str, arrays: dict, props: ImageProperties = None,
                    meta: dict = None, files: dict = None):
        grp = self._f.require_group(f"data/{name}")
        for category, arr in arrays.items():
            arr = np.asarray(arr)
            chunks = (1,) + arr.shape[1:] if arr.ndim >= 3 else None
            grp.create_dataset(category, data=arr, chunks=chunks)
        pgrp = self._f.require_group(f"props/{name}")
        if props is not None:
            pgrp.attrs["size"] = np.asarray(props.size, np.int64)
            pgrp.attrs["spacing"] = np.asarray(props.spacing, np.float64)
            pgrp.attrs["origin"] = np.asarray(props.origin, np.float64)
            pgrp.attrs["direction"] = np.asarray(props.direction, np.float64)
        mgrp = self._f.require_group(f"meta/{name}")
        for k, v in (meta or {}).items():
            mgrp.attrs[k] = v
        if files:
            mgrp.attrs["files"] = json.dumps(files)
        self._subjects.append(name)

    def close(self):
        if self._f is None:
            return  # idempotent: an explicit close() before __exit__ is fine
        dt = h5py.string_dtype()
        self._f.create_dataset("subjects", data=np.asarray(self._subjects, dtype=dt))
        self._f.close()
        self._f = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and self._f is not None:
            # do NOT finalize on error: writing the subjects index would
            # leave a valid-looking PARTIAL store that a later SubjectDataset
            # opens cleanly (silently truncated training data)
            self._f.close()
            self._f = None
            return False
        self.close()


class SubjectDataset:
    """Read-side handle over a subject H5 store.

    ``subject_subset`` restricts visibility (the split mechanism, reference
    ``common/trainloop/context.py:152-163`` loads train/valid subsets).
    """

    def __init__(self, path: str, subject_subset: typing.Sequence[str] = None):
        self.dataset_path = path
        self._f = h5py.File(path, "r", swmr=False)
        # h5py group traversal (f["data/<s>/<c>"]) costs ~0.25 ms per call —
        # per-row that is ~8 ms on a 32-slice batch, a third of the collate
        # budget (scripts/bench_loader.py). Handles are tiny; cache them.
        self._handles: dict = {}
        all_subjects = [s.decode() if isinstance(s, bytes) else s
                        for s in self._f["subjects"][()]]
        if subject_subset is not None:
            subset = set(subject_subset)
            missing = subset - set(all_subjects)
            if missing:
                raise ValueError(f"subjects not in dataset: {sorted(missing)}")
            self.subjects = [s for s in all_subjects if s in subset]
        else:
            self.subjects = all_subjects
        self.subject_subset = list(self.subjects)

    def categories(self, subject: str = None):
        subject = subject or self.subjects[0]
        return sorted(self._f[f"data/{subject}"].keys())

    def _ds(self, subject: str, category: str):
        key = (subject, category)
        ds = self._handles.get(key)
        if ds is None:
            ds = self._handles[key] = self._f[f"data/{subject}/{category}"]
        return ds

    def shape(self, subject: str, category: str = "images"):
        return self._ds(subject, category).shape

    def dtype(self, subject: str, category: str = "images"):
        return self._ds(subject, category).dtype

    def read_slice(self, subject: str, index: int, category: str):
        return self._ds(subject, category)[index]

    def read_slice_into(self, subject: str, index: int, category: str,
                        dest, dest_index: int) -> bool:
        """Read slice ``index`` straight into ``dest[dest_index]`` (HDF5
        ``read_direct`` — no intermediate array, no collate copy). Returns
        False when the stored slice shape/dtype doesn't match ``dest``'s row
        so the caller can fall back to the copying path."""
        return self.read_slices_into(subject, index, index + 1, category,
                                     dest, dest_index)

    def read_slices_into(self, subject: str, start: int, stop: int,
                         category: str, dest, dest_start: int) -> bool:
        """Ranged ``read_direct``: slices ``[start, stop)`` straight into
        ``dest[dest_start:dest_start+(stop-start)]``. One HDF5 call per run
        of consecutive slices is ~3x over per-row calls and ~2x over
        per-row fancy reads + ``np.stack`` on the BraTS slice workload
        (scripts/bench_loader.py); the loader's collate coalesces each
        batch into such runs. Returns False on shape/dtype mismatch so the
        caller can fall back to the copying path."""
        ds = self._ds(subject, category)
        if ds.shape[1:] != dest.shape[1:] or ds.dtype != dest.dtype:
            return False
        ds.read_direct(dest, np.s_[start:stop],
                       np.s_[dest_start:dest_start + (stop - start)])
        return True

    def read_volume(self, subject: str, category: str):
        return self._ds(subject, category)[()]

    def properties(self, subject: str) -> ImageProperties:
        attrs = self._f[f"props/{subject}"].attrs
        if "size" not in attrs:
            z = self.shape(subject)[0:3]
            return ImageProperties(size=tuple(int(v) for v in z[::-1]))
        return ImageProperties(
            size=tuple(int(v) for v in attrs["size"]),
            spacing=tuple(float(v) for v in attrs["spacing"]),
            origin=tuple(float(v) for v in attrs["origin"]),
            direction=tuple(float(v) for v in attrs["direction"]),
        )

    def meta(self, subject: str) -> dict:
        return dict(self._f[f"meta/{subject}"].attrs)

    def files(self, subject: str) -> dict:
        m = self.meta(subject)
        return json.loads(m["files"]) if "files" in m else {}

    def close(self):
        self._handles.clear()
        self._f.close()
