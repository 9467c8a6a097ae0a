"""Regression tests for the engine-robustness review fixes: resume-aware
hooks, crash-safe checkpointing, run-dir collisions, prefetch lifetime,
validation safety rails, and strict transform params."""
import csv
import os
import threading
import time

import numpy as np
import pytest

from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import databuild, hooks as hooks_lib
from rcu_tpu.engine.config import ParametricNode


class _DummyLoop:
    """Just enough TrainLoop surface for the checkpoint-retention hooks."""

    def __init__(self, tmp_path):
        self.model_files = ckpt_lib.ModelFiles(str(tmp_path / "model_x"))
        os.makedirs(self.model_files.weight_checkpoint_dir, exist_ok=True)

    def save_checkpoint(self, epoch, best=False):
        ckpt_lib.save_checkpoint(self.model_files,
                                 {"params": {"w": np.zeros(2)}}, epoch, best)


class TestResumeAwareHooks:
    def test_validation_csv_keeps_preresume_rows(self, tmp_path):
        path = str(tmp_path / "validation_metrics.csv")
        first = hooks_lib.WriteValidationMetricsCsvHook(path)
        first.on_validation_subject_end(None, 0, "s00", {"dice": 0.5})
        first.on_validation_end(None, 0, 0.5, True, [])

        resumed = hooks_lib.WriteValidationMetricsCsvHook(path)
        resumed.on_validation_subject_end(None, 1, "s00", {"dice": 0.7})
        resumed.on_validation_end(None, 1, 0.7, True, [])

        with open(path, newline="") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["epoch", "subject", "dice"]
        assert [r[0] for r in rows[1:]] == ["0", "1"]  # both epochs survive

    def test_validation_csv_drops_rerun_epoch_rows(self, tmp_path):
        """ADVICE r2: resuming from a checkpoint EARLIER than the last
        validated epoch re-runs those epochs — their preloaded rows must be
        dropped at startup or the CSV interleaves stale and fresh rows for
        the same (epoch, subject)."""
        path = str(tmp_path / "validation_metrics.csv")
        first = hooks_lib.WriteValidationMetricsCsvHook(path)
        for epoch, dice in ((0, 0.5), (1, 0.6), (2, 0.7)):
            first.on_validation_subject_end(None, epoch, "s00", {"dice": dice})
        first.on_validation_end(None, 2, 0.7, True, [])

        class LoopStub:
            resume_epoch = 0  # checkpoint at epoch 0 -> epochs 1,2 re-run

        resumed = hooks_lib.WriteValidationMetricsCsvHook(path)
        resumed.on_startup(LoopStub())
        resumed.on_validation_subject_end(None, 1, "s00", {"dice": 0.65})
        resumed.on_validation_end(None, 1, 0.65, True, [])

        with open(path, newline="") as f:
            rows = list(csv.reader(f))
        assert [(r[0], r[2]) for r in rows[1:]] == [("0", "0.5"),
                                                    ("1", "0.65")]

    def test_tensorboard_step_derives_from_epoch(self, tmp_path, monkeypatch):
        hook = hooks_lib.TensorboardHook(str(tmp_path / "tb"))
        steps = []
        monkeypatch.setattr(hook.writer, "add_scalar",
                            lambda tag, v, step: steps.append(step))
        # a resumed run starts at epoch 2 of 10-batch epochs
        hook.on_training_batch_end(None, 2, 3, 10, {"loss": 1.0})
        hook.on_training_end(None, 2, {})
        assert steps == [23]

    def test_keep_n_adopts_existing_checkpoints(self, tmp_path):
        loop = _DummyLoop(tmp_path)
        for epoch in (0, 1, 2):  # pre-resume files
            loop.save_checkpoint(epoch)
        hook = hooks_lib.SaveNLastModelHook(3)
        hook.on_startup(loop)
        hook.on_epoch_end(loop, 3)
        kept = ckpt_lib.find_epoch_checkpoints(loop.model_files)
        assert kept == [1, 2, 3]  # epoch 0 pruned, window still rolls

    def test_best_is_saved_before_old_best_is_deleted(self, tmp_path,
                                                      monkeypatch):
        loop = _DummyLoop(tmp_path)
        loop.save_checkpoint(0, best=True)
        order = []
        real_save = loop.save_checkpoint
        real_delete = ckpt_lib.delete_checkpoint
        monkeypatch.setattr(
            loop, "save_checkpoint",
            lambda *a, **k: (order.append("save"), real_save(*a, **k)))
        monkeypatch.setattr(
            hooks_lib.ckpt_lib, "delete_checkpoint",
            lambda *a, **k: (order.append("delete"), real_delete(*a, **k)))
        hooks_lib.SaveBestModelHook().on_validation_end(loop, 5, 0.9, True, [])
        assert order == ["save", "delete"]
        assert ckpt_lib.find_best_checkpoint_epoch(loop.model_files) == 5

    def test_double_best_after_crash_resolves_to_newest(self, tmp_path):
        """A crash inside SaveBestModelHook's save-new-then-delete-old window
        leaves two -best files; 'best' must resolve to the NEWEST epoch
        (best_score is monotone within a run) or the stale model would be
        served forever."""
        loop = _DummyLoop(tmp_path)
        loop.save_checkpoint(5, best=True)
        loop.save_checkpoint(10, best=True)  # crash before deleting ep005
        assert ckpt_lib.find_best_checkpoint_epoch(loop.model_files) == 10
        # the next new-best save prunes the leftover via prev=10
        hooks_lib.SaveBestModelHook().on_validation_end(loop, 12, 0.95, True, [])
        assert ckpt_lib.find_best_checkpoint_epoch(loop.model_files) == 12


class TestCheckpointAtomicity:
    def test_no_tmp_residue_and_roundtrip(self, tmp_path):
        loop = _DummyLoop(tmp_path)
        path = ckpt_lib.save_checkpoint(
            loop.model_files, {"params": {"w": np.arange(3.0)}}, 7)
        assert not any(f.endswith(".tmp") for f in
                       os.listdir(loop.model_files.weight_checkpoint_dir))
        restored = ckpt_lib.load_checkpoint(path)
        np.testing.assert_array_equal(restored["params"]["w"], np.arange(3.0))


class TestPrefetchLifetime:
    def test_abandoned_consumer_releases_worker(self):
        from rcu_tpu.data.loader import prefetch
        started = threading.active_count()

        def many():
            for i in range(10_000):
                yield {"i": np.full(4, i)}

        gen = prefetch(many(), size=2, device_put=False)
        next(gen)
        gen.close()  # consumer abandons mid-stream
        deadline = time.time() + 5.0
        while threading.active_count() > started and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= started


class TestTransformParams:
    def test_rescale_forwards_source_range(self):
        tfm = databuild.build_transform(
            [{"rescale": {"lower": 0.0, "upper": 1.0,
                          "old_min": 0.0, "old_max": 65535.0}}])
        out = tfm({"images": np.asarray([0.0, 65535.0], np.float32)})
        np.testing.assert_allclose(out["images"], [0.0, 1.0])

    def test_unknown_rescale_param_raises(self):
        with pytest.raises(ValueError, match="unknown rescale"):
            databuild.build_transform([{"rescale": {"lowr": 0.0}}])

    def test_rescale_uses_per_entry_minmax(self):
        """pymia IntensityRescale parity: without an explicit source range
        the entry's OWN min/max maps to [lower, upper] — an image with range
        [10, 200] becomes full-range [0, 1], not [10/255, 200/255]."""
        tfm = databuild.build_transform(
            [{"rescale": {"lower": 0.0, "upper": 1.0}}])
        out = tfm({"images": np.asarray([10.0, 105.0, 200.0], np.float32)})
        np.testing.assert_allclose(out["images"], [0.0, 0.5, 1.0])

    def test_rescale_constant_array_fails_loudly(self):
        tfm = databuild.build_transform(
            [{"rescale": {"lower": 0.0, "upper": 1.0}}])
        with pytest.raises(ValueError, match="constant"):
            tfm({"images": np.zeros((4,), np.float32)})

    def test_relabel_applies_changes_sequentially(self):
        """pymia Relabel parity: each new<-old mapping is applied in dict
        order ON the previous mappings' output — {2: 1} then {3: 2} sends
        original 1s (via 2) AND original 2s to 3. The old masked-against-
        original behavior gave [0, 2, 3, 3] here (original 1s stuck at 2)."""
        from rcu_tpu.data import transforms as tfm_lib
        tfm = tfm_lib.Relabel({2: 1, 3: 2})
        out = tfm({"labels": np.asarray([0, 1, 2, 3], np.uint8)})
        np.testing.assert_array_equal(out["labels"], [0, 3, 3, 3])

    def test_unknown_size_param_raises(self):
        with pytest.raises(ValueError, match="unknown size"):
            databuild.build_transform(
                [{"size": {"size": [8, 8], "entires": ["labels"]}}])


class TestBorderMaskParity:
    def test_distance_is_unsigned_sum(self):
        """border_mask's distance map is dist_in + dist_out (positive on both
        sides of the boundary), exactly like reference labelhelper.py:12-20."""
        from scipy import ndimage
        from rcu_tpu.utils.labels import border_mask
        mask = np.zeros((7, 7), bool)
        mask[2:5, 2:5] = True
        distance, border = border_mask(mask, 1, 1)
        expected = (ndimage.distance_transform_edt(mask)
                    + ndimage.distance_transform_edt(~mask))
        np.testing.assert_array_equal(distance, expected)
        assert (distance >= 0).all()
        np.testing.assert_array_equal(
            border, (ndimage.distance_transform_edt(mask) <= 1)
            & (ndimage.distance_transform_edt(~mask) <= 1))


class TestEceBinaryStrategy:
    def test_threshold_range_keeps_bins(self):
        """threshold_range + return_bins must fill the bins_* entries (the
        reference fills out_bins regardless of threshold_range)."""
        from rcu_tpu.ops.strategy import EceBinary
        rng = np.random.RandomState(0)
        probs = rng.rand(50).astype(np.float32)
        target = (rng.rand(50) > 0.5).astype(np.uint8)
        results = {}
        EceBinary(threshold_range=(0.2, 0.8), return_bins=True)(
            {"probabilities": probs, "target": target}, results)
        assert {"ece", "bins_count", "bins_avg_confidence",
                "bins_positive_fraction", "bins_non_zero"} <= set(results)
        # only in-range voxels are counted
        in_range = ((probs > 0.2) & (probs < 0.8)).sum()
        assert results["bins_count"].sum() == in_range


class TestPrepareRangeChecks:
    def test_unrescaled_uncertainty_fails_loudly(self):
        from rcu_tpu.eval.analysis import ToForegroundProbabilities
        with pytest.raises(ValueError, match="larger than 1"):
            ToForegroundProbabilities()(
                {"probabilities": np.asarray([0.0, 37.2], np.float32),
                 "prediction": np.asarray([0, 1], np.uint8)})

    def test_out_of_range_probability_fails_loudly(self):
        from rcu_tpu.eval.analysis import AddBackgroundProbabilities
        with pytest.raises(ValueError, match="smaller than 0"):
            AddBackgroundProbabilities()(
                {"probabilities": np.asarray([-0.5, 0.5], np.float32)})

    def test_entropy_noise_only_warns(self):
        from rcu_tpu.eval.analysis import ToEntropy
        probs = np.stack([np.asarray([0.5]), np.asarray([0.5])], -1)
        out = ToEntropy()( {"probabilities": probs})
        assert float(out["uncertainty"][0]) == pytest.approx(1.0)


class TestProfilerHookBounds:
    def test_short_epoch_still_stops_trace(self, tmp_path, monkeypatch):
        import rcu_tpu.utils.profiling as prof
        calls = []
        monkeypatch.setattr(prof.jax.profiler, "start_trace",
                            lambda d: calls.append("start"))
        monkeypatch.setattr(prof.jax.profiler, "stop_trace",
                            lambda: calls.append("stop"))
        hook = prof.ProfilerHook(str(tmp_path), start_step=2, stop_step=5)
        for i in range(3):  # epoch shorter than stop_step
            hook.on_training_batch_end(None, 0, i, 3, {})
        hook.on_training_end(None, 0, {})
        assert calls == ["start", "stop"]


class TestEnsemblePlaceholderConfig:
    def test_empty_member_list_fails_with_message(self, tmp_path):
        """The generated ensemble configs ship others.model_dir: [] as a
        fill-me-in placeholder; running them unmodified must raise the
        friendly error, not a tree_map crash."""
        from rcu_tpu import strategies
        from tests.test_strategies import base_test_cfg, make_store
        from rcu_tpu.data.split import save_split
        store = make_store(str(tmp_path / "d.h5"))
        split = str(tmp_path / "s.json")
        save_split(split, ["s00"], ["s01"], ["s02"])
        cfg = base_test_cfg(tmp_path, store, split, model_dir=None,
                            others={"model_dir": [], "test_at": "best"})
        cfg.model_dir = None
        with pytest.raises(ValueError, match="model_dir"):
            strategies.test_ensemble(cfg)


class TestMeshOverSubscription:
    def test_requesting_more_devices_than_available_raises(self):
        from rcu_tpu.parallel import mesh as mesh_lib
        import jax
        available = len(jax.devices())
        with pytest.raises(ValueError, match="available"):
            mesh_lib.make_mesh(n_devices=available + 1)


class TestFusedEnsembleNames:
    def test_duplicate_member_names_rejected(self, tmp_path):
        from rcu_tpu.parallel.ensemble import train_ensemble_fused
        from tests.test_strategies import base_train_cfg, make_store
        from rcu_tpu.data.split import save_split
        store = make_store(str(tmp_path / "d.h5"))
        split = str(tmp_path / "s.json")
        save_split(split, ["s00"], ["s01"], ["s02"])
        configs = [base_train_cfg(tmp_path, store, split, name="member")
                   for _ in range(2)]
        with pytest.raises(ValueError, match="distinct"):
            train_ensemble_fused(configs)


@pytest.mark.slow
class TestTrainTestIntegration:
    def test_test_at_epoch_zero_loads_epoch_zero(self, tmp_path, caplog):
        """test_at: 0 must select checkpoint_ep000, not fall through to
        'best' (`or "best"` treated the epoch-0 int as falsy)."""
        import logging
        from rcu_tpu import strategies
        from rcu_tpu.data.split import save_split
        from tests.test_strategies import (base_test_cfg, base_train_cfg,
                                           make_store)
        store = make_store(str(tmp_path / "d.h5"))
        split = str(tmp_path / "s.json")
        save_split(split, ["s00"], ["s01"], ["s02"])
        loop = strategies.train_default(
            base_train_cfg(tmp_path, store, split, epochs=2, name="at0"))
        cfg = base_test_cfg(tmp_path, store, split,
                            loop.model_files.model_dir, name="at0_test")
        cfg.test_at = 0
        with caplog.at_level(logging.INFO):
            strategies.test_default(cfg)
        assert "checkpoint_ep000.ckpt" in caplog.text

    def test_empty_validation_never_freezes_a_best(self, tmp_path, caplog):
        """No assembled validation subjects (here: a selection strategy that
        drops every slice of the all-background valid subject) must mean NO
        -best checkpoint and a warning — not a score of -inf frozen as 'best'
        forever."""
        import logging
        from rcu_tpu import strategies
        from rcu_tpu.data import h5
        from rcu_tpu.data.nifti import ImageProperties
        from rcu_tpu.data.split import save_split
        from tests.test_strategies import base_train_cfg

        rng = np.random.RandomState(3)
        store = str(tmp_path / "d.h5")
        with h5.DatasetWriter(store) as w:
            for i in range(3):
                gt = np.zeros((2, 16, 16), np.uint8)
                if i != 1:  # s01 (the valid subject) stays all-background
                    gt[:, 4:12, 4:12] = 1
                w.add_subject(f"s{i:02d}",
                              {"images": rng.rand(2, 16, 16, 2).astype(
                                  np.float32),
                               "labels": gt},
                              props=ImageProperties(size=(16, 16, 2)))
        split = str(tmp_path / "s.json")
        save_split(split, ["s00"], ["s01"], ["s02"])
        cfg = base_train_cfg(tmp_path, store, split, name="noval")
        cfg.valid_data.selection_strategy = ParametricNode.parse(
            {"with-foreground": {}})
        with caplog.at_level(logging.WARNING):
            loop = strategies.train_default(cfg)
        assert ckpt_lib.find_best_checkpoint_epoch(loop.model_files) is None
        assert "no assembled subjects" in caplog.text


class TestRunDirCollision:
    def test_fresh_train_runs_never_share_a_dir(self, tmp_path, monkeypatch):
        from rcu_tpu.engine.train import TrainLoop
        from rcu_tpu.models import get_model, get_optimizer
        from rcu_tpu.utils import ids as ids_lib
        from tests.test_strategies import base_train_cfg, make_store
        from rcu_tpu.data.split import save_split

        store = make_store(str(tmp_path / "d.h5"))
        split = str(tmp_path / "s.json")
        save_split(split, ["s00"], ["s01"], ["s02"])
        ids = iter(["260101-000000", "260101-000000", "260101-000001"])
        monkeypatch.setattr(ids_lib, "unique_identifier", lambda: next(ids))
        monkeypatch.setattr(time, "sleep", lambda s: None)

        def build():
            cfg = base_train_cfg(tmp_path, store, split, name="dup")
            loop = TrainLoop(cfg,
                             model=get_model("unet", {
                                 "depth": 2, "dropout": 0.2, "in_channels": 2,
                                 "nb_classes": 2, "start_filters": 4}),
                             optimizer=get_optimizer("adam", {"lr": 1e-3}))
            loop.setup_directory()
            return loop

        first, second = build(), build()
        assert first.run_dir != second.run_dir
        assert second.run_id == "260101-000001"
