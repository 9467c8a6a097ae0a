"""ISIC-native 2D pipeline end-to-end: folder dataset, EmptyIndexing,
Subject2dAssembler, rescale transforms, symlink artifacts, aux-segm merge."""
import glob
import os

import numpy as np
import pytest
from PIL import Image

from rcu_tpu import strategies
from rcu_tpu.data import nifti
from rcu_tpu.data.isic import IsicFolderDataset
from rcu_tpu.engine import config as cfg_lib

pytestmark = pytest.mark.slow

H, W = 32, 48  # small stand-in for 192x256


def make_isic_tree(root, task="ISIC-2017_Training", nb=4, seed=7):
    data = root / f"{task}_Data"
    gt = root / f"{task}_Part1_GroundTruth"
    data.mkdir(parents=True, exist_ok=True)
    gt.mkdir(exist_ok=True)
    rng = np.random.RandomState(seed)
    subjects = []
    for i in range(nb):
        s = f"ISIC_{i:07d}"
        mask = np.zeros((H, W), np.uint8)
        mask[8:24, 12:36] = 255
        img = (rng.rand(H, W, 3) * 60).astype(np.uint8)
        img[..., 0] = np.where(mask > 0, 220, img[..., 0])  # learnable signal
        Image.fromarray(img).save(data / f"{s}.jpg")
        Image.fromarray(mask).save(gt / f"{s}_segmentation.png")
        Image.fromarray((rng.rand(H, W) * 255).astype(np.uint8)).save(
            data / f"{s}_superpixels.png")
        subjects.append(s)
    return str(root / task), subjects


def isic_data_cfg(dataset, shuffle):
    return cfg_lib.DataConfiguration.from_dict({
        "batch_size": 4, "dataset": dataset, "shuffle": shuffle,
        "transform": [{"rescale": {"entries": ["images", "labels"],
                                   "lower": 0, "upper": 1}}],
    })


@pytest.fixture(scope="module")
def isic_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("isic")
    train_dir, subjects = make_isic_tree(tmp, "ISIC-2017_Training")
    test_dir, _ = make_isic_tree(tmp, "ISIC-2017_Test_v2", nb=2, seed=9)
    cfg = cfg_lib.TrainConfiguration(
        epochs=2, seed=20, split="", train_dir=str(tmp / "out"),
        train_name="isic_toy",
        model=cfg_lib.ParametricNode("unet", dict(
            depth=2, dropout=0.1, in_channels=3, nb_classes=2, start_filters=4)),
        optimizer=cfg_lib.ParametricNode("adam", {"lr": 0.003}),
        train_data=isic_data_cfg(train_dir, True),
        valid_data=isic_data_cfg(train_dir, False))
    loop = strategies.train_default(cfg)
    return tmp, train_dir, test_dir, loop


class TestIsicFolderDataset:
    def test_interface(self, isic_env):
        tmp, train_dir, test_dir, loop = isic_env
        ds = IsicFolderDataset(train_dir, with_superpixels=True)
        assert len(ds.subjects) == 4
        assert ds.categories() == ["images", "labels", "superpixels"]
        img = ds.read_volume(ds.subjects[0], "images")
        assert img.shape == (H, W, 3) and img.dtype == np.uint8
        gt = ds.read_volume(ds.subjects[0], "labels")
        assert set(np.unique(gt)) == {0, 255}
        sp = ds.read_volume(ds.subjects[0], "superpixels")
        assert sp.shape == (H, W)
        assert ds.properties(ds.subjects[0]).size == (W, H)


class TestIsicTraining:
    def test_native_2d_validation_ran(self, isic_env):
        tmp, train_dir, test_dir, loop = isic_env
        assert loop.best_score is not None and np.isfinite(loop.best_score)
        csv_path = os.path.join(loop.run_dir, "validation_metrics.csv")
        with open(csv_path) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) > 4  # 4 subjects x 2 epochs + header


class TestIsicTest:
    def test_artifacts_and_symlinks(self, isic_env, tmp_path):
        tmp, train_dir, test_dir, loop = isic_env
        tcfg = cfg_lib.TestConfiguration(
            seed=20, split="", model_dir=loop.model_files.model_dir,
            test_name="isic_toy_test", test_dir=str(tmp_path / "pred"),
            test_at="best", test_data=isic_data_cfg(test_dir, False))
        tloop = strategies.test_default(tcfg, symlink_inputs=True)
        probs = sorted(glob.glob(os.path.join(tloop.run_dir,
                                              "*_probabilities.nii.gz")))
        assert len(probs) == 2
        fg, props = nifti.read(probs[0])
        assert fg.shape == (H, W)
        # symlinked original inputs (reference isic_test_default.py:118-124)
        links = [p for p in os.listdir(tloop.run_dir)
                 if os.path.islink(os.path.join(tloop.run_dir, p))]
        assert any(p.endswith(".jpg") for p in links)
        assert any(p.endswith("_segmentation.png") for p in links)

    def test_aux_segm_prediction_merge(self, isic_env, tmp_path):
        tmp, train_dir, test_dir, loop = isic_env
        # fake baseline predictions for the training subjects
        pred_dir = tmp_path / "baseline_preds"
        pred_dir.mkdir()
        ds = IsicFolderDataset(train_dir)
        for s in ds.subjects:
            gt = (ds.read_volume(s, "labels") > 0).astype(np.uint8)
            gt[0:4, :] = 1 - gt[0:4, :]  # baseline makes errors in top rows
            nifti.write(gt, str(pred_dir / f"{s}_prediction.nii.gz"))
        merged = IsicFolderDataset(train_dir, prediction_dir=str(pred_dir))
        labels = merged.read_volume(merged.subjects[0], "labels")
        assert labels.shape == (H, W, 2)
        assert set(np.unique(labels[..., 1])).issubset({0, 255})  # x255 quirk

        cfg = cfg_lib.TrainConfiguration(
            epochs=1, seed=20, split="", train_dir=str(tmp_path / "out"),
            train_name="isic_auxsegm",
            model=cfg_lib.ParametricNode("unet", dict(
                depth=2, dropout=0.1, in_channels=4, nb_classes=2,
                start_filters=4)),
            optimizer=cfg_lib.ParametricNode("adam", {"lr": 0.001}),
            train_data=isic_data_cfg(train_dir, True),
            valid_data=isic_data_cfg(train_dir, False),
            others={"prediction_dir": str(pred_dir)})
        aux_loop = strategies.train_auxiliary_segm(cfg)
        assert aux_loop.best_score is not None
