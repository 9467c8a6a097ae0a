"""Parallel-module tests: mesh sharding equivalence + fused ensemble training."""
import glob
import os

import jax
import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import steps as steps_lib
from rcu_tpu.engine.state import create_train_state
from rcu_tpu.models import get_model, get_optimizer
from rcu_tpu.parallel import ensemble as ens_lib
from rcu_tpu.parallel import mesh as mesh_lib
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store


def tiny_model():
    model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                   start_filters=4, dropout=0.1))
    optimizer = get_optimizer("adam", {"lr": 1e-3})
    return model, optimizer


def tiny_batch(nb, hw=16, seed=0):
    rng = np.random.RandomState(seed)
    return {"images": rng.rand(nb, hw, hw, 2).astype(np.float32),
            "labels": (rng.rand(nb, hw, hw) > 0.5).astype(np.uint8),
            "valid": np.ones((nb,), np.float32)}


class TestMeshEquivalence:
    def test_sharded_step_matches_single_device(self):
        """One sharded step over 8 devices == the same step on one device.

        SGD (not Adam) so updates are proportional to gradients — Adam's
        g/sqrt(g^2) normalization amplifies float reassociation noise on
        near-zero gradients into sign flips, which is not a sharding bug."""
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.1))
        optimizer = get_optimizer("sgd", {"lr": 1e-2})
        raw = steps_lib.make_train_step(model, optimizer, donate=False)
        inner = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw
        state = create_train_state(model, optimizer, (1, 16, 16, 2),
                                   jax.random.PRNGKey(0))
        batch = tiny_batch(16)
        rng = jax.random.PRNGKey(5)

        single_state, single_metrics = raw(state, batch, rng)

        mesh = mesh_lib.make_mesh()
        sharded = mesh_lib.shard_train_step(inner, mesh, donate=False)
        state2 = create_train_state(model, optimizer, (1, 16, 16, 2),
                                    jax.random.PRNGKey(0))
        sh_state, sh_metrics = sharded(state2, batch, rng)

        np.testing.assert_allclose(float(single_metrics["loss"]),
                                   float(sh_metrics["loss"]), rtol=1e-5)
        a = jax.tree_util.tree_leaves(single_state.params)
        b = jax.tree_util.tree_leaves(sh_state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-6)

    def test_pad_batch_size(self):
        mesh = mesh_lib.make_mesh()
        assert mesh_lib.pad_batch_size_to_mesh(10, mesh) == 16
        assert mesh_lib.pad_batch_size_to_mesh(16, mesh) == 16


class TestMeshInference:
    def test_test_loop_with_mesh(self, tmp_path):
        """TestLoop with a mesh: batches land pre-sharded; outputs assemble."""
        store = make_store(str(tmp_path / "ds.h5"))
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        baseline = strategies.train_default(
            base_train_cfg(tmp_path, store, split_file, name="mesh_base"))
        mesh = mesh_lib.make_mesh()
        tcfg = base_test_cfg(tmp_path, store, split_file,
                             baseline.model_files.model_dir,
                             others={"mc": 3}, name="mesh_test")
        loop = strategies.test_default(tcfg, mesh=mesh)
        probs = glob.glob(os.path.join(loop.run_dir, "*_probabilities.nii.gz"))
        assert len(probs) == 1


class TestFusedEnsemble:
    def test_fused_matches_sequential_member(self):
        """Member 0 of a vmapped 2-member step == training it alone."""
        model, optimizer = tiny_model()
        raw = steps_lib.make_train_step(model, optimizer, donate=False)
        inner = raw.__wrapped__ if hasattr(raw, "__wrapped__") else raw
        states = [create_train_state(model, optimizer, (1, 16, 16, 2),
                                     jax.random.PRNGKey(i)) for i in range(2)]
        stacked = ens_lib.stack_states(states)
        batches = [tiny_batch(8, seed=i) for i in range(2)]
        stacked_batch = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *batches)
        rngs = jax.random.split(jax.random.PRNGKey(3), 2)

        vstep = jax.jit(ens_lib.make_vmapped_ensemble_train_step(inner))
        new_stacked, metrics = vstep(stacked, stacked_batch, rngs)

        solo_state, solo_metrics = raw(states[0], batches[0], rngs[0])
        np.testing.assert_allclose(float(np.asarray(metrics["loss"])[0]),
                                   float(solo_metrics["loss"]), rtol=1e-5)

    def test_train_ensemble_fused_end_to_end(self, tmp_path):
        store = make_store(str(tmp_path / "ds.h5"), nb_subjects=4)
        split_file = str(tmp_path / "split.json")
        # k-fold style: per-member train lists, shared valid/test
        save_split(split_file, [["s00"], ["s01"]], [["s02"], ["s02"]],
                   [["s03"], ["s03"]])
        configs = []
        for k in range(2):
            cfg = base_train_cfg(tmp_path, store, split_file, name=f"member{k}")
            cfg.others["split_k"] = k
            configs.append(cfg)
        mesh = ens_lib.make_ensemble_mesh(2)
        members = ens_lib.train_ensemble_fused(configs, mesh=mesh)
        assert len(members) == 2
        for m in members:
            assert m.best_score is not None
            assert ckpt_lib.find_best_checkpoint_epoch(m.model_files) is not None
            assert os.path.exists(m.model_files.model_path)
        # the per-member artifacts feed the standard ensemble test loop
        tcfg = base_test_cfg(tmp_path, store, split_file,
                             members[0].model_files.model_dir,
                             others={"model_dir": [members[1].model_files.model_dir],
                                     "test_at": "best"},
                             name="fused_ens_test")
        tcfg.others["split_k"] = 0
        loop = strategies.test_ensemble(tcfg)
        probs = glob.glob(os.path.join(loop.run_dir, "*_probabilities.nii.gz"))
        assert len(probs) == 1
