"""Direct one-pass test+eval: CSV families, schema, and mesh equality."""
import csv
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.eval.actions import CORRECTION_KEYS
from rcu_tpu.eval.direct import evaluate_direct
from rcu_tpu.parallel import mesh as mesh_lib
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store

pytestmark = pytest.mark.slow


def read_csv(path):
    with open(path) as fp:
        rows = list(csv.reader(fp))
    return rows[0], rows[1:]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("direct")
    store = make_store(str(tmp_path / "ds.h5"), channels=4, nb_subjects=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02", "s03"])
    cfg = base_train_cfg(tmp_path, store, split_file, name="direct_base",
                         model={"unet": {"depth": 2, "dropout": 0.2,
                                         "in_channels": 4, "nb_classes": 2,
                                         "start_filters": 4}})
    loop = strategies.train_default(cfg)
    return tmp_path, store, split_file, loop


class TestDirectEval:
    def _cfg(self, trained, name):
        tmp_path, store, split_file, loop = trained
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name=name)
        cfg.test_data.batch_size = 2
        return cfg

    def test_csv_families_and_schema(self, trained, tmp_path):
        out_dir = str(tmp_path / "direct_out")
        eces = evaluate_direct(self._cfg(trained, "d1"), out_dir,
                               run_id="baseline", mc=3)
        assert set(eces) == {"s02", "s03"}
        files = sorted(os.listdir(out_dir))
        assert "eval_calibration_baseline.csv" in files
        assert sum(1 for f in files if f.startswith("eval_uncertainty")) == 11

        header, body = read_csv(os.path.join(out_dir,
                                             "eval_calibration_baseline.csv"))
        assert "bins_count_00" in header and header[-2:] == ["ece", "dice"]
        assert len(body) == 2 and body[0][1] == "s02"

        header, body = read_csv(os.path.join(
            out_dir, "eval_uncertainty_baseline_th050.csv"))
        assert list(header[2:]) == list(CORRECTION_KEYS)
        assert len(body) == 2

    def test_mesh_modes_match_single_device(self, trained, tmp_path):
        """Latency (intra-volume sharding) AND throughput (subject-parallel)
        modes produce the same CSVs as the single-device run."""
        single_dir = str(tmp_path / "direct_single")
        cfg = self._cfg(trained, "d2")
        evaluate_direct(cfg, single_dir, run_id="baseline", mc=3)
        modes = {
            "latency": dict(mesh=mesh_lib.make_mesh(n_devices=2)),
            "throughput": dict(mesh=mesh_lib.make_mesh(n_devices=2),
                               subject_parallel=True),
        }
        for mode, kwargs in modes.items():
            mode_dir = str(tmp_path / f"direct_{mode}")
            evaluate_direct(cfg, mode_dir, run_id="baseline", mc=3, **kwargs)
            for name in sorted(os.listdir(single_dir)):
                h1, b1 = read_csv(os.path.join(single_dir, name))
                h2, b2 = read_csv(os.path.join(mode_dir, name))
                assert h1 == h2, (mode, name)
                assert len(b1) == len(b2), (mode, name)
                for r1, r2 in zip(b1, b2):
                    for v1, v2 in zip(r1, r2):
                        try:
                            np.testing.assert_allclose(
                                float(v1), float(v2), rtol=1e-4, atol=1e-6)
                        except ValueError:
                            assert v1 == v2, (mode, name, v1, v2)
