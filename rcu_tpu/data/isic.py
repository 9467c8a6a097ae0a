"""ISIC-2017 image-folder dataset (reference rechun/dl/customdatasets.py:12-112).

Exposes the same duck-typed interface as :class:`rcu_tpu.data.h5.SubjectDataset`
(``subjects``, ``shape``, ``read_volume``, ``properties``, ``files``) so the
loader/assembler stack is dataset-agnostic. Each subject is one 2D image; use
``EmptyIndexing`` + ``Subject2dAssembler``.

Reference parity details:
- images are the resized jpg/png files (prepare_isic_data.py output);
- labels are the ``*_segmentation.png`` masks with values {0, 255}; value
  scaling to [0,1] is done by the config's ``rescale`` transform, not here;
- optional merge of baseline predictions as a second label channel for the
  auxiliary-segm strategy; predictions (stored 0/1 NIfTI) are multiplied by
  255 to share the gt value range before rescaling — the reference's explicit
  quirk (customdatasets.py:65-69).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from rcu_tpu.data import nifti
from rcu_tpu.data.collector import IsicCollector
from rcu_tpu.data.nifti import ImageProperties


class IsicFolderDataset:
    def __init__(self, root_dir: str, subject_subset=None,
                 with_superpixels: bool = False, prediction_dir: str = None):
        self.dataset_path = root_dir
        collector = IsicCollector(root_dir, with_superpixels)
        self._subject_files = {sf.subject: sf for sf in collector.get_subject_files()}
        subjects = sorted(self._subject_files)
        if subject_subset is not None:
            subset = set(subject_subset)
            missing = subset - set(subjects)
            if missing:
                raise ValueError(f"subjects not in dataset: {sorted(missing)}")
            subjects = [s for s in subjects if s in subset]
        self.subjects = subjects
        self.subject_subset = list(subjects)
        self.prediction_dir = prediction_dir
        self.with_superpixels = with_superpixels

    def categories(self, subject: str = None):
        cats = ["images", "labels"]
        if self.with_superpixels:
            cats.append("superpixels")
        return cats

    def _image_path(self, subject):
        return self._subject_files[subject].categories["images"].entries["image"]

    def _label_path(self, subject):
        return self._subject_files[subject].categories["labels"].entries["gt"]

    def shape(self, subject: str, category: str = "images"):
        if category == "superpixels":
            # header-only read like the images branch (a full pixel decode
            # just for the shape wastes a host decode per query)
            path = self._subject_files[subject].categories["images"] \
                .entries["superpixels"]
            sp = Image.open(path)
            w, h = sp.size
            nb_ch = len(sp.getbands())
            return (h, w) if nb_ch == 1 else (h, w, nb_ch)
        img = Image.open(self._image_path(subject))
        w, h = img.size
        if category == "images":
            return (h, w, 3)
        nb_label_ch = 2 if self.prediction_dir else 1
        return (h, w) if nb_label_ch == 1 else (h, w, nb_label_ch)

    def read_volume(self, subject: str, category: str):
        if category == "images":
            return np.asarray(Image.open(self._image_path(subject)).convert("RGB"))
        if category == "superpixels":
            path = self._subject_files[subject].categories["images"] \
                .entries["superpixels"]
            return np.asarray(Image.open(path))
        gt = np.asarray(Image.open(self._label_path(subject)).convert("L"))
        if not self.prediction_dir:
            return gt
        pred_path = os.path.join(self.prediction_dir,
                                 f"{subject}_prediction.nii.gz")
        pred, _ = nifti.read(pred_path)
        pred = np.squeeze(pred).astype(np.uint8) * 255  # reference x255 quirk
        return np.stack([gt, pred], axis=-1)

    def read_slice(self, subject: str, index: int, category: str):
        return self.read_volume(subject, category)

    def properties(self, subject: str) -> ImageProperties:
        h, w, _ = self.shape(subject)
        return ImageProperties(size=(w, h))

    def files(self, subject: str) -> dict:
        sf = self._subject_files[subject]
        return {c: dict(cat.entries) for c, cat in sf.categories.items()}

    def meta(self, subject: str) -> dict:
        return {}
