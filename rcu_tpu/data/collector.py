"""Filesystem collectors -> SubjectFile lists (reference common/data/collector.py).

``SubjectFile`` mirrors the pymia structure the reference passes around:
a subject name plus ``categories[category].entries[entry] -> path``.
"""
from __future__ import annotations

import dataclasses
import glob
import os
import typing


@dataclasses.dataclass
class Category:
    entries: dict


class SubjectFile:
    def __init__(self, subject: str, **categories: dict):
        self.subject = subject
        self.categories = {name: Category(entries=dict(entries))
                           for name, entries in categories.items()}

    def flat_entries(self):
        return {(c, e): p for c, cat in self.categories.items()
                for e, p in cat.entries.items()}


class Brats17Collector:
    """BraTS17/18 layout: ``<root>/[HGG|LGG]/<subject>/<subject>_{flair,t1,t1ce,t2,seg}.nii.gz``
    (reference collector.py:31-72)."""

    IMAGE_ENTRIES = ("flair", "t1", "t1ce", "t2")

    def __init__(self, root_dir: str, with_grade: bool = True):
        self.root_dir = root_dir
        self.with_grade = with_grade

    def get_subject_files(self) -> list:
        pattern = os.path.join(self.root_dir, "*", "*") if self.with_grade \
            else os.path.join(self.root_dir, "*")
        subject_dirs = sorted(d for d in glob.glob(pattern) if os.path.isdir(d))
        subject_files = []
        for d in subject_dirs:
            subject = os.path.basename(d)
            images, labels = {}, {}
            for entry in self.IMAGE_ENTRIES:
                path = os.path.join(d, f"{subject}_{entry}.nii.gz")
                if not os.path.exists(path):
                    raise ValueError(f"missing image file {path}")
                images[entry] = path
            seg = os.path.join(d, f"{subject}_seg.nii.gz")
            if not os.path.exists(seg):
                raise ValueError(f"missing label file {seg}")
            labels["gt"] = seg
            sf = SubjectFile(subject, images=images, labels=labels)
            if self.with_grade:
                sf.grade = os.path.basename(os.path.dirname(d))
            subject_files.append(sf)
        return subject_files


class IsicCollector:
    """ISIC-2017 layout: ``<root>_Data/ISIC_<id>.jpg|png`` +
    ``<root>_Part1_GroundTruth/ISIC_<id>_segmentation.png`` (collector.py:75-119)."""

    def __init__(self, root_dir: str, with_superpixels: bool = False):
        self.root_dir = root_dir
        self.with_superpixels = with_superpixels

    def get_subject_files(self) -> list:
        data_dir = self.root_dir + "_Data"
        gt_dir = self.root_dir + "_Part1_GroundTruth"
        image_paths = sorted(
            p for p in glob.glob(os.path.join(data_dir, "ISIC_*"))
            if not p.endswith("_superpixels.png"))
        subject_files = []
        for img in image_paths:
            subject = os.path.basename(img)[:12]  # 'ISIC_' + 7-digit id
            gt = os.path.join(gt_dir, f"{subject}_segmentation.png")
            if not os.path.exists(gt):
                raise ValueError(f"missing ground truth {gt}")
            images = {"image": img}
            if self.with_superpixels:
                sp = os.path.join(data_dir, f"{subject}_superpixels.png")
                if not os.path.exists(sp):
                    raise ValueError(f"missing superpixels {sp}")
                images["superpixels"] = sp
            subject_files.append(SubjectFile(subject, images=images,
                                             labels={"gt": gt}))
        return subject_files


class PostfixPredictionCollector:
    """Collects ``<subject>_<postfix>.nii.gz`` artifacts from a prediction dir
    into the given categories (reference collector.py:122-161). ``post_fixes``
    and ``categories`` are parallel: the i-th postfix goes into the i-th
    category (with 'prediction' under 'labels' and confidence/sigma under
    'misc', per reference evaldata.py usage)."""

    def __init__(self, prediction_dir: str, post_fixes: list, categories: list):
        self.prediction_dir = prediction_dir
        self.post_fixes = list(post_fixes)
        self.categories = list(categories)

    def get_subject_files(self) -> list:
        by_subject: dict = {}
        for postfix, category in zip(self.post_fixes, self.categories):
            paths = sorted(glob.glob(
                os.path.join(self.prediction_dir, f"*_{postfix}.nii.gz")))
            if not paths:
                raise ValueError(
                    f"no '*_{postfix}.nii.gz' files in {self.prediction_dir}")
            for p in paths:
                subject = os.path.basename(p)[: -len(f"_{postfix}.nii.gz")]
                by_subject.setdefault(subject, {}).setdefault(category, {})[postfix] = p
        # per-subject completeness assert (reference collector.py:152-153):
        # an interrupted test run leaving only SOME of a subject's artifacts
        # must fail here, not as a far-away KeyError in an eval action (or
        # a silent evaluation of an incomplete run)
        want = set(self.post_fixes)
        for subject, cats in sorted(by_subject.items()):
            have = {pf for cat in cats.values() for pf in cat}
            if have != want:
                raise ValueError(
                    f"subject '{subject}' in {self.prediction_dir} is "
                    f"missing artifacts {sorted(want - have)} (has "
                    f"{sorted(have)}) — incomplete test run?")
        return [SubjectFile(s, **cats) for s, cats in sorted(by_subject.items())]


def combine(*subject_file_lists) -> list:
    """Merge categories of same-subject SubjectFiles across collections
    (reference collector.py:164-174). Restricted to subjects present in ALL
    lists (intersection): the reference indexes sf_from_by_id[sf_to.subject]
    and fails loudly for a prediction subject absent from the ground-truth
    collection — a stray subject must not be emitted prediction-only and
    KeyError far away in the eval pipeline."""
    keeps = [set(sf.subject for sf in lst) for lst in subject_file_lists]
    keep = set.intersection(*keeps)
    for lst_keep, lst in zip(keeps, subject_file_lists):
        extra = lst_keep - keep
        if extra and lst is subject_file_lists[-1]:
            # the last list is the prediction set (reference sf_to side):
            # an unmatched prediction subject is the loud-failure case
            raise KeyError(
                f"prediction subjects {sorted(extra)} have no counterpart "
                "in the ground-truth collection(s)")
    merged: dict = {}
    for lst in subject_file_lists:
        for sf in lst:
            if sf.subject not in keep:
                continue
            tgt = merged.setdefault(sf.subject, {})
            for cname, cat in sf.categories.items():
                tgt.setdefault(cname, {}).update(cat.entries)
    return [SubjectFile(s, **cats) for s, cats in sorted(merged.items())]
