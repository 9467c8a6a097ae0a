"""End-to-end engine tests on a synthetic BraTS-like store, virtual 8-dev CPU mesh."""
import glob
import os

import numpy as np
import pytest
import yaml

from rcu_tpu.data import h5, nifti
from rcu_tpu.data.nifti import ImageProperties
from rcu_tpu.data.split import save_split
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine.test import TestLoop
from rcu_tpu.engine.train import TrainLoop
from rcu_tpu.parallel import make_mesh


def make_store(path, nb_subjects=4, nb_slices=4, hw=(16, 16), channels=2, seed=9):
    rng = np.random.RandomState(seed)
    with h5.DatasetWriter(path) as w:
        for i in range(nb_subjects):
            labels = np.zeros((nb_slices, *hw), np.uint8)
            labels[:, 4:12, 4:12] = 1  # learnable blob
            images = rng.rand(nb_slices, *hw, channels).astype(np.float32) * 0.1
            images[..., 0] += labels  # strong signal in channel 0
            w.add_subject(f"s{i:02d}", {"images": images, "labels": labels},
                          props=ImageProperties(size=(hw[1], hw[0], nb_slices)))
    return path


def make_train_config(tmp_path, store, split_file=None, epochs=2, batch_size=8):
    d = {
        "config": {
            "train_name": "toy_baseline",
            "train_dir": str(tmp_path / "out"),
            "split": split_file or "",
            "epochs": epochs,
            "model": {"unet": {"depth": 2, "dropout": 0.1, "in_channels": 2,
                               "nb_classes": 2, "start_filters": 4}},
            "optimizer": {"adam": {"lr": 0.001}},
            "seed": 20,
            "valid_every_nth": 1,
            "log_every_nth": 10,
            "others": {},
            "train_data": {"batch_size": batch_size, "dataset": store,
                           "indexing": {"slice": {}},
                           "selection_strategy": {"none-black": {}},
                           "shuffle": True,
                           "transform": [{"permute": {"permutation": [2, 0, 1]}},
                                         "squeeze"]},
            "valid_data": {"batch_size": batch_size, "dataset": store,
                           "indexing": {"slice": {}}, "shuffle": False},
        },
        "meta": {"type": "train-config", "version": 0},
    }
    path = str(tmp_path / "train.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(d, f)
    return path


class TestConfigSystem:
    def test_load_reference_style_yaml(self, tmp_path):
        store = make_store(str(tmp_path / "ds.h5"))
        path = make_train_config(tmp_path, store)
        cfg = cfg_lib.load(path, expected_type="train-config")
        assert cfg.model.type == "unet" and cfg.model.params["depth"] == 2
        assert cfg.optimizer.params["lr"] == 0.001
        assert cfg.train_data.indexing.type == "slice"
        assert cfg.train_data.selection_strategy.type == "none-black"
        assert [n.type for n in cfg.train_data.transform] == ["permute", "squeeze"]

    def test_save_roundtrip(self, tmp_path):
        store = make_store(str(tmp_path / "ds.h5"))
        cfg = cfg_lib.load(make_train_config(tmp_path, store))
        out = str(tmp_path / "resaved.yaml")
        cfg_lib.save(cfg, out)
        cfg2 = cfg_lib.load(out, expected_type="train-config")
        assert cfg2.model.params == cfg.model.params
        assert cfg2.train_data.batch_size == cfg.train_data.batch_size

    def test_wrong_type_rejected(self, tmp_path):
        store = make_store(str(tmp_path / "ds.h5"))
        path = make_train_config(tmp_path, store)
        with pytest.raises(ValueError):
            cfg_lib.load(path, expected_type="test-config")


class _LossRecorder:
    """Minimal hook recording per-epoch mean train loss."""

    def __init__(self):
        self.epoch_losses = []

    def __getattr__(self, name):
        if name.startswith("on_"):
            return lambda *a, **k: None
        raise AttributeError(name)

    def on_training_end(self, loop, epoch, metrics_mean):
        self.epoch_losses.append(metrics_mean.get("loss"))


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train")
    store = make_store(str(tmp_path / "ds.h5"))
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00", "s01"], ["s02"], ["s03"])
    cfg = cfg_lib.load(make_train_config(tmp_path, store, split_file, epochs=3))
    recorder = _LossRecorder()
    loop = TrainLoop(cfg)
    loop.hook.hooks.append(recorder)
    loop.run()
    loop.loss_recorder = recorder
    return tmp_path, store, split_file, loop


class TestTrainLoop:
    def test_run_dir_contract(self, trained_run):
        _, _, _, loop = trained_run
        assert os.path.isdir(loop.run_dir)
        assert os.path.exists(os.path.join(loop.run_dir, "config.yaml"))
        assert os.path.exists(os.path.join(loop.run_dir, "log.txt"))
        assert os.path.exists(os.path.join(loop.run_dir, "validation_metrics.csv"))
        assert os.path.exists(loop.model_files.model_path)

    def test_same_second_fresh_runs_get_distinct_dirs(self, trained_run,
                                                      tmp_path):
        """Fresh-run dir reservation is an atomic exclusive create: two
        loops constructed within the same 1-second id window must not share
        a run dir (checkpoints/CSVs would interleave)."""
        _, store, split_file, _ = trained_run
        cfg = cfg_lib.load(make_train_config(tmp_path, store, split_file))
        a = TrainLoop(cfg)
        b = TrainLoop(cfg)
        assert a.run_dir != b.run_dir
        assert os.path.isdir(a.run_dir) and os.path.isdir(b.run_dir)

    def test_checkpoint_retention(self, trained_run):
        _, _, _, loop = trained_run
        files = glob.glob(os.path.join(loop.model_files.weight_checkpoint_dir, "*"))
        bests = [f for f in files if f.endswith("-best.ckpt")]
        normals = [f for f in files if not f.endswith("-best.ckpt")]
        assert len(bests) == 1
        assert len(normals) == 3  # keep-3 rolling over 3 epochs

    def test_loss_decreases(self, trained_run):
        _, _, _, loop = trained_run
        losses = loop.loss_recorder.epoch_losses
        assert len(losses) == 3
        assert losses[-1] < losses[0]
        assert loop.best_score is not None and np.isfinite(loop.best_score)

    def test_resume_by_id(self, trained_run):
        tmp_path, store, split_file, loop = trained_run
        cfg = cfg_lib.load(make_train_config(tmp_path, store, split_file, epochs=4))
        cfg.train_name = os.path.basename(loop.run_dir)  # '<id>_toy_baseline'
        loop2 = TrainLoop(cfg)
        assert loop2.resume and loop2.run_dir == loop.run_dir
        loop2.run()
        # epoch 4 checkpoint exists after resume (epochs 3 trained before)
        assert ckpt_lib.find_last_checkpoint_epoch(loop2.model_files) == 3


class TestTestLoop:
    def test_artifacts_and_metrics(self, trained_run, tmp_path):
        run_tmp, store, split_file, loop = trained_run
        tcfg = cfg_lib.TestConfiguration(
            seed=20, split=split_file, model_dir=loop.model_files.model_dir,
            test_name="toy_test", test_dir=str(tmp_path / "pred"),
            test_at="best",
            test_data=cfg_lib.DataConfiguration.from_dict(
                {"batch_size": 8, "dataset": store, "indexing": {"slice": {}},
                 "shuffle": False}))
        tloop = TestLoop(tcfg).run()
        # only test-split subject s03
        probs = glob.glob(os.path.join(tloop.run_dir, "*_probabilities.nii.gz"))
        preds = glob.glob(os.path.join(tloop.run_dir, "*_prediction.nii.gz"))
        assert len(probs) == 1 and "s03" in probs[0]
        assert len(preds) == 1
        fg, props = nifti.read(probs[0])
        assert fg.shape == (4, 16, 16)
        assert 0.0 <= fg.min() and fg.max() <= 1.0
        pred, _ = nifti.read(preds[0])
        assert set(np.unique(pred)).issubset({0, 1})
        assert os.path.exists(os.path.join(tloop.run_dir, "metrics.csv"))
        with open(os.path.join(tloop.run_dir, "metrics.csv")) as f:
            lines = f.read().strip().splitlines()
        assert lines[0].startswith("subject,") and len(lines) == 2

    def test_external_state_needs_no_model_or_model_dir(self, trained_run,
                                                        tmp_path):
        """external_state declares that predict_fn carries its own params:
        constructing without model AND without model_dir must work (the
        stacked-ensemble-closure contract) — but only with an explicit
        predict_fn."""
        run_tmp, store, split_file, loop = trained_run
        tcfg = cfg_lib.TestConfiguration(
            seed=20, split=split_file, model_dir=None, test_name="ext",
            test_dir=str(tmp_path / "ext"), test_at="best",
            test_data=cfg_lib.DataConfiguration.from_dict(
                {"batch_size": 8, "dataset": store, "indexing": {"slice": {}},
                 "shuffle": False}))
        tloop = TestLoop(tcfg, predict_fn=lambda p, s, b: {},
                         external_state=True)
        assert tloop.model is None and os.path.isdir(tloop.run_dir)
        with pytest.raises(ValueError, match="predict_fn"):
            TestLoop(tcfg, external_state=True)

    def test_same_second_runs_get_distinct_dirs(self, trained_run, tmp_path):
        """Run-dir reservation is an atomic exclusive create: two loops
        constructed within the same 1-second id window must not share a
        run dir (artifacts/metrics would interleave)."""
        run_tmp, store, split_file, loop = trained_run
        def cfg():
            return cfg_lib.TestConfiguration(
                seed=20, split=split_file, model_dir=None, test_name="dup",
                test_dir=str(tmp_path / "dup"), test_at="best",
                test_data=cfg_lib.DataConfiguration.from_dict(
                    {"batch_size": 8, "dataset": store,
                     "indexing": {"slice": {}}, "shuffle": False}))
        a = TestLoop(cfg(), predict_fn=lambda p, s, b: {}, external_state=True)
        b = TestLoop(cfg(), predict_fn=lambda p, s, b: {}, external_state=True)
        assert a.run_dir != b.run_dir
        assert os.path.isdir(a.run_dir) and os.path.isdir(b.run_dir)

    def test_test_at_missing_checkpoint(self, trained_run, tmp_path):
        run_tmp, store, split_file, loop = trained_run
        tcfg = cfg_lib.TestConfiguration(
            seed=20, split=split_file, model_dir=loop.model_files.model_dir,
            test_name="bad", test_dir=str(tmp_path / "pred2"), test_at=99,
            test_data=cfg_lib.DataConfiguration.from_dict(
                {"batch_size": 8, "dataset": store, "indexing": {"slice": {}},
                 "shuffle": False}))
        with pytest.raises(FileNotFoundError):
            TestLoop(tcfg).run()


class TestRematPolicies:
    def test_remat_policies_are_numerically_identical(self):
        """remat='conv' (save tagged conv outputs, recompute the fused
        elementwise epilogue) and remat='full' change WHAT the bwd stores,
        never what it computes — one step must match remat=None exactly."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rcu_tpu.engine import steps as steps_lib
        from rcu_tpu.engine.state import create_train_state
        from rcu_tpu.models import get_model, get_optimizer

        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.1))
        optimizer = get_optimizer("adam", {"lr": 1e-3})
        rng = np.random.RandomState(0)
        batch = {"images": jnp.asarray(rng.rand(4, 16, 16, 2), jnp.float32),
                 "labels": jnp.asarray(rng.rand(4, 16, 16) > 0.5, jnp.int32),
                 "valid": jnp.ones((4,), jnp.float32)}
        key = jax.random.PRNGKey(0)
        results = {}
        for remat in (None, "conv", "full"):
            state = create_train_state(model, optimizer, (1, 16, 16, 2),
                                       jax.random.PRNGKey(7))
            step = steps_lib.make_train_step(model, optimizer, donate=False,
                                             remat=remat)
            new_state, metrics = step(state, batch, key)
            results[remat] = (float(metrics["loss"]), new_state.params)
        for remat in ("conv", "full"):
            assert results[remat][0] == results[None][0]
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                results[remat][1], results[None][1])

    def test_unknown_remat_rejected(self):
        import pytest as _pytest

        from rcu_tpu.engine import steps as steps_lib
        from rcu_tpu.models import get_model, get_optimizer
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4))
        with _pytest.raises(ValueError, match="remat"):
            steps_lib.make_train_step(model, get_optimizer("adam",
                                                           {"lr": 1e-3}),
                                      remat="everything")


class TestMeshTraining:
    def test_sharded_training_runs(self, tmp_path):
        import jax
        store = make_store(str(tmp_path / "ds.h5"))
        cfg = cfg_lib.load(make_train_config(tmp_path, store, epochs=1,
                                             batch_size=8))
        mesh = make_mesh()
        assert mesh.devices.size == 8
        from rcu_tpu.engine import steps as steps_lib
        from rcu_tpu.models import get_model, get_optimizer
        from rcu_tpu.parallel import shard_train_step
        model = get_model(cfg.model.type, cfg.model.params)
        optimizer = get_optimizer(cfg.optimizer.type, cfg.optimizer.params)
        raw_step = steps_lib.make_train_step(model, optimizer, donate=False)
        # re-jit over the mesh (state replicated, batch sharded)
        inner = raw_step.__wrapped__ if hasattr(raw_step, "__wrapped__") else raw_step
        loop = TrainLoop(cfg, mesh=mesh, model=model, optimizer=optimizer,
                         train_step=shard_train_step(inner, mesh))
        loop.run()
        assert loop.best_score is not None
