"""End-to-end strategy tests: MC, aleatoric, ensemble, auxiliary feat/segm."""
import glob
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data import h5, nifti
from rcu_tpu.data.nifti import ImageProperties
from rcu_tpu.data.split import save_split
from rcu_tpu.engine import config as cfg_lib

pytestmark = pytest.mark.slow


def make_store(path, nb_subjects=3, nb_slices=2, hw=(16, 16), channels=2,
               label_channels=1, seed=3):
    rng = np.random.RandomState(seed)
    with h5.DatasetWriter(path) as w:
        for i in range(nb_subjects):
            gt = np.zeros((nb_slices, *hw), np.uint8)
            gt[:, 4:12, 4:12] = 1
            images = rng.rand(nb_slices, *hw, channels).astype(np.float32) * 0.1
            images[..., 0] += gt
            if label_channels == 2:
                baseline = gt.copy()
                baseline[:, 4:8, 4:8] = 0  # baseline makes errors here
                labels = np.stack([gt, baseline], axis=-1)
            else:
                labels = gt
            w.add_subject(f"s{i:02d}", {"images": images, "labels": labels},
                          props=ImageProperties(size=(hw[1], hw[0], nb_slices)))
    return path


def base_train_cfg(tmp_path, store, split_file, model=None, epochs=1,
                   others=None, name="toy"):
    cfg = cfg_lib.TrainConfiguration(
        epochs=epochs, seed=20, split=split_file,
        train_dir=str(tmp_path / "out"), train_name=name,
        model=cfg_lib.ParametricNode.parse(model or
            {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 2,
                      "nb_classes": 2, "start_filters": 4}}),
        optimizer=cfg_lib.ParametricNode.parse({"adam": {"lr": 0.001}}),
        train_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 6, "dataset": store, "indexing": {"slice": {}},
             "shuffle": True}),
        valid_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 6, "dataset": store, "indexing": {"slice": {}},
             "shuffle": False}),
        others=others or {})
    return cfg


def base_test_cfg(tmp_path, store, split_file, model_dir, others=None,
                  name="toy_test"):
    return cfg_lib.TestConfiguration(
        seed=20, split=split_file, model_dir=model_dir, test_name=name,
        test_dir=str(tmp_path / "pred"), test_at="best",
        test_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 6, "dataset": store, "indexing": {"slice": {}},
             "shuffle": False}),
        others=others or {})


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("strat")
    store = make_store(str(tmp_path / "ds.h5"))
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    baseline = strategies.train_default(
        base_train_cfg(tmp_path, store, split_file, name="baseline"))
    return tmp_path, store, split_file, baseline


class TestMcDropout:
    def test_mc_test_writes_artifacts(self, env, tmp_path):
        run_tmp, store, split_file, baseline = env
        cfg = base_test_cfg(tmp_path, store, split_file,
                            baseline.model_files.model_dir, others={"mc": 4})
        loop = strategies.test_default(cfg)
        probs = glob.glob(os.path.join(loop.run_dir, "*_probabilities.nii.gz"))
        assert len(probs) == 1 and "s02" in probs[0]
        fg, _ = nifti.read(probs[0])
        assert fg.shape == (2, 16, 16)
        assert 0.0 < fg.mean() < 1.0


class TestAleatoric:
    def test_train_and_test(self, env, tmp_path):
        run_tmp, store, split_file, _ = env
        model = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 2,
                          "nb_classes": 2, "start_filters": 4, "sigma_out": True}}
        train = strategies.train_aleatoric(base_train_cfg(
            run_tmp, store, split_file, model=model,
            others={"is_log_sigma": False}, name="aleatoric"))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            train.model_files.model_dir,
                            others={"is_log_sigma": False}, name="alea_test")
        loop = strategies.test_aleatoric(cfg)
        sigmas = glob.glob(os.path.join(loop.run_dir, "*_sigma.nii.gz"))
        assert len(sigmas) == 1
        sigma, _ = nifti.read(sigmas[0])
        assert sigma.shape == (2, 16, 16)
        assert np.all(sigma >= 0)  # abs() semantics for non-log sigma

    def test_missing_is_log_sigma_raises(self, env, tmp_path):
        run_tmp, store, split_file, baseline = env
        with pytest.raises(ValueError, match="is_log_sigma"):
            strategies.train_aleatoric(base_train_cfg(
                run_tmp, store, split_file, name="bad"))


class TestEnsemble:
    def test_stacked_ensemble(self, env, tmp_path):
        run_tmp, store, split_file, baseline = env
        second = strategies.train_default(
            base_train_cfg(run_tmp, store, split_file, name="member2"))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            baseline.model_files.model_dir,
                            others={"model_dir": [second.model_files.model_dir],
                                    "test_at": "best"},
                            name="ens_test")
        loop = strategies.test_ensemble(cfg)
        probs = glob.glob(os.path.join(loop.run_dir, "*_probabilities.nii.gz"))
        assert len(probs) == 1
        with open(os.path.join(loop.run_dir, "metrics.csv")) as f:
            assert len(f.read().strip().splitlines()) == 2

    def test_missing_model_dir_raises(self, env, tmp_path):
        run_tmp, store, split_file, baseline = env
        cfg = base_test_cfg(tmp_path, store, split_file,
                            baseline.model_files.model_dir, name="bad_ens")
        with pytest.raises(ValueError, match="model_dir"):
            strategies.test_ensemble(cfg)


class TestAuxiliaryFeat:
    def test_train_and_test(self, env, tmp_path):
        run_tmp, store, split_file, baseline = env
        model = {"postnet": {"in_channels": 4, "nb_classes": 2}}
        train = strategies.train_auxiliary_feat(base_train_cfg(
            run_tmp, store, split_file, model=model,
            others={"model_dir": baseline.model_files.model_dir,
                    "test_at": "best"},
            name="auxfeat"))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            train.model_files.model_dir,
                            others={"model_dir": baseline.model_files.model_dir,
                                    "test_at": "best"},
                            name="auxfeat_test")
        loop = strategies.test_auxiliary_feat(cfg)
        confs = glob.glob(os.path.join(loop.run_dir, "*_confidence.nii.gz"))
        preds = glob.glob(os.path.join(loop.run_dir, "*_prediction.nii.gz"))
        assert len(confs) == 1 and len(preds) == 1
        conf, _ = nifti.read(confs[0])
        assert conf.shape == (2, 16, 16)
        assert 0.0 <= conf.min() and conf.max() <= 1.0


class TestAuxiliarySegm:
    def test_train_and_test(self, tmp_path):
        store = make_store(str(tmp_path / "wpred.h5"), label_channels=2)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        model = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 3,
                          "nb_classes": 2, "start_filters": 4}}
        train = strategies.train_auxiliary_segm(base_train_cfg(
            tmp_path, store, split_file, model=model, name="auxsegm"))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            train.model_files.model_dir, name="auxsegm_test")
        loop = strategies.test_auxiliary_segm(cfg)
        confs = glob.glob(os.path.join(loop.run_dir, "*_confidence.nii.gz"))
        preds = glob.glob(os.path.join(loop.run_dir, "*_prediction.nii.gz"))
        assert len(confs) == 1 and len(preds) == 1
        # prediction artifact is the BASELINE passthrough
        pred, _ = nifti.read(preds[0])
        baseline = np.zeros((2, 16, 16), np.uint8)
        baseline[:, 4:12, 4:12] = 1
        baseline[:, 4:8, 4:8] = 0
        np.testing.assert_array_equal(pred, baseline)
