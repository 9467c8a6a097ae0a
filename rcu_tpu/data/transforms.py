"""Host-side sample transforms (pymia transformation registry replacement).

Parity target: the registry entries consumed via
``common/trainloop/factory.py:10-15`` — size, permute, squeeze, unsqueeze,
rescale, relabel — plus intensity normalization used by the dataset builder
(``scripts/create_brats18_dataset.py:63``).

Note on layout: the reference permutes to channels-first for torch
(``permute: [2,0,1]``). The TPU framework is channels-LAST end-to-end, so
configs carrying the torch permute are recognized and treated as no-ops by the
config layer (see engine/config.py) — these transforms exist for explicit use
and for building datasets.
"""
from __future__ import annotations

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


class EntriesTransform:
    def __init__(self, entries=None):
        self.entries = entries

    def _apply(self, arr):
        raise NotImplementedError

    def __call__(self, sample: dict) -> dict:
        entries = self.entries if self.entries is not None else list(sample.keys())
        for e in entries:
            if e in sample and isinstance(sample[e], np.ndarray):
                sample[e] = self._apply(sample[e])
        return sample


class Permute(EntriesTransform):
    def __init__(self, permutation, entries=None):
        super().__init__(entries)
        self.permutation = tuple(permutation)

    def _apply(self, arr):
        return np.transpose(arr, self.permutation)


class Squeeze(EntriesTransform):
    def _apply(self, arr):
        return np.squeeze(arr)


class UnSqueeze(EntriesTransform):
    def __init__(self, axis=-1, entries=None):
        super().__init__(entries)
        self.axis = axis

    def _apply(self, arr):
        return np.expand_dims(arr, self.axis)


class Rescale(EntriesTransform):
    """The reference's ``rescale`` node (pymia ``IntensityRescale``): linear
    rescale of each entry's OWN min/max range to [lower, upper] — an ISIC
    jpg with pixel range [10, 200] maps to the full [0, 1], not to
    [10/255, 200/255]. ``old_min``/``old_max`` are an extension: when given,
    they fix the source range explicitly instead of reading it per array.
    A constant array has no range and fails loudly (pymia would emit NaN)."""

    def __init__(self, lower=0.0, upper=1.0, old_min=None, old_max=None,
                 entries=None):
        super().__init__(entries)
        self.lower, self.upper = float(lower), float(upper)
        self.old_min = None if old_min is None else float(old_min)
        self.old_max = None if old_max is None else float(old_max)

    def _apply(self, arr):
        arr = arr.astype(np.float32)
        lo = arr.min() if self.old_min is None else self.old_min
        hi = arr.max() if self.old_max is None else self.old_max
        if hi == lo:
            raise ValueError(
                "rescale: array has a constant value "
                f"({lo}); its min-max range cannot be rescaled (pass "
                "old_min/old_max to fix the source range explicitly)")
        scaled = (arr - lo) / (hi - lo)
        return scaled * (self.upper - self.lower) + self.lower


class Relabel(EntriesTransform):
    def __init__(self, label_changes: dict, entries=("labels",)):
        super().__init__(entries)
        self.label_changes = dict(label_changes)

    def _apply(self, arr):
        # SEQUENTIAL in-place changes, exactly like pymia's Relabel: with
        # {2: 1, 3: 2} the original 1s end at 3 (each change sees the
        # previous ones' output, not the original array)
        out = arr.copy()
        for new, old in self.label_changes.items():
            out[out == old] = new
        return out


class Size(EntriesTransform):
    """Center crop/pad to a fixed spatial size (leading spatial dims)."""

    def __init__(self, size, entries=None):
        super().__init__(entries)
        self.size = tuple(size)

    def _apply(self, arr):
        out = arr
        for axis, target in enumerate(self.size):
            cur = out.shape[axis]
            if cur > target:
                start = (cur - target) // 2
                sl = [slice(None)] * out.ndim
                sl[axis] = slice(start, start + target)
                out = out[tuple(sl)]
            elif cur < target:
                pad = [(0, 0)] * out.ndim
                before = (target - cur) // 2
                pad[axis] = (before, target - cur - before)
                out = np.pad(out, pad)
        return out


class IntensityNormalization(EntriesTransform):
    """Per-channel z-score over ALL voxels (not nonzero-masked), matching
    pymia IntensityNormalization(loop_axis=-1): plain (x-mean)/std per
    trailing-axis channel."""

    def __init__(self, entries=("images",)):
        super().__init__(entries)

    def _apply(self, arr):
        arr = arr.astype(np.float32)
        axes = tuple(range(arr.ndim - 1))
        mean = arr.mean(axis=axes, keepdims=True)
        std = arr.std(axis=axes, keepdims=True)
        std = np.where(std == 0, 1.0, std)
        return (arr - mean) / std


class ToBinary(EntriesTransform):
    """Binarize labels: anything > 0 becomes 1 (create_brats18_dataset.py:34-36)."""

    def __init__(self, entries=("labels",)):
        super().__init__(entries)

    def _apply(self, arr):
        return (arr > 0).astype(arr.dtype if arr.dtype != np.bool_ else np.uint8)
