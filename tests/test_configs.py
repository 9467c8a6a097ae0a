"""Smoke tests over the generated config family: every yaml loads, resolves
against the registries, and the strategy-specific knobs are present."""
import glob
import os

import pytest

from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import databuild
from rcu_tpu.models import get_model, get_optimizer

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO_ROOT, "config")

ALL_YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"),
                             recursive=True))


class TestConfigFamily:
    def test_counts(self):
        assert len(ALL_YAMLS) == 66
        names = [os.path.basename(p) for p in ALL_YAMLS]
        assert sum(n.startswith("train_") for n in names) == 40
        assert sum(n.startswith("test_") for n in names) == 26

    @pytest.mark.parametrize("path", ALL_YAMLS,
                             ids=[os.path.relpath(p, CONFIG_DIR)
                                  for p in ALL_YAMLS])
    def test_loads_and_resolves(self, path):
        cfg = cfg_lib.load(path)
        if isinstance(cfg, cfg_lib.TrainConfiguration):
            model = get_model(cfg.model.type, cfg.model.params)
            get_optimizer(cfg.optimizer.type, cfg.optimizer.params)
            assert cfg.train_data.dataset and cfg.valid_data.dataset
            databuild.build_indexing(cfg.train_data.indexing)
            databuild.build_transform(cfg.train_data.transform)
            if cfg.train_data.selection_strategy is not None:
                databuild.build_selection(cfg.train_data.selection_strategy,
                                          cfg.train_data.selection_extractor)
        else:
            assert cfg.test_at in ("best", "last") or isinstance(cfg.test_at, int)
            databuild.build_indexing(cfg.test_data.indexing)

    def test_strategy_knobs(self):
        alea = cfg_lib.load(os.path.join(CONFIG_DIR, "train_brats_aleatoric.yaml"))
        assert alea.others["is_log_sigma"] is False
        assert alea.model.params["sigma_out"] is True
        mc = cfg_lib.load(os.path.join(CONFIG_DIR, "test_brats_baseline_mc.yaml"))
        assert mc.others["mc"] == 20
        ens = cfg_lib.load(os.path.join(CONFIG_DIR, "train_ensemble",
                                        "train_brats_ensemble_3.yaml"))
        assert ens.others["split_k"] == 3
        auxf = cfg_lib.load(os.path.join(CONFIG_DIR,
                                         "train_brats_auxiliary_feat.yaml"))
        assert auxf.model.type == "postnet"
        assert "model_dir" in auxf.others and auxf.others["test_at"] == "best"
        auxs = cfg_lib.load(os.path.join(CONFIG_DIR,
                                         "train_brats_auxiliary_segm.yaml"))
        assert auxs.model.params["in_channels"] == 5
        isic_auxs = cfg_lib.load(os.path.join(CONFIG_DIR,
                                              "test_isic_auxiliary_segm.yaml"))
        assert isic_auxs.test_at == "last"  # reference quirk
        center = cfg_lib.load(os.path.join(CONFIG_DIR, "train_brats_center.yaml"))
        assert center.model.params["dropout"] == 0.5
        assert center.model.params["dropout_center"] == 4
