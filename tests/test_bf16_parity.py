"""bf16 production-dtype parity gate (BASELINE.json: "ECE/Dice parity to
1e-3").

The production configuration runs the fused direct-eval programs with the
model's compute dtype overridden to bfloat16 (checkpoint params and BN stats
stay f32). This gate certifies it: for trained checkpoints of the headline
MC strategy and the aleatoric strategy, every per-subject ECE and Dice of a
``dtype='bfloat16'`` direct run must match the f32 run within 1e-3 — the
same bar BASELINE.json sets for parity against the reference. bench.py's
headline (direct+bf16) cites this gate.

Measured outcome (the reason the promotion is per-strategy):
- **MC / ensemble (softmax confidence)** pass the 1e-3 gate — softmax (or
  member-mean) probabilities of trained segmenters sit far from the bin
  edges, so the ~0.4% bf16 perturbation rarely moves a voxel across one.
  bf16 IS the production dtype for these paths; bench.py's headline cites
  this test.
- **Aleatoric / sigma confidence** does NOT reliably clear 1e-3: the
  predicted-class sigma spans a narrow range that the global rescale
  stretches across all 10 bins, so bf16's relative error on the sigma path
  moves voxels between bins. The per-module mixed-precision split was
  MEASURED (round 4): with the sigma head (ConvBnRelu_1 + 1x1) and the
  rescale/fold epilogue forced to f32 (models/unet.py), per-subject ECE
  deltas drop from 0.7-1.5e-3 to 0.1-1.05e-3 across trained models
  (log/linear sigma, varied widths/seeds) — head/epilogue dtype was about
  HALF the error; the residual is bf16 noise on the trunk features feeding
  the head, i.e. the component that buys the MXU rate. The f32 head ships
  (it is free for f32 models and halves the opt-in bf16 error), but bf16
  stays OPT-IN for sigma heads; the test pins the measured envelope
  (<= 2e-3, was 5e-3 before the f32 head) so a real regression (e.g. a
  bf16 sigma-path bug) still fails loudly.
"""
import csv
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.eval.direct import evaluate_direct
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store

pytestmark = pytest.mark.slow

GATE = 1e-3          # BASELINE.json "ECE/Dice parity to 1e-3"
SIGMA_ENVELOPE = 2e-3  # measured bf16 sigma-protocol envelope with the f32
#                        sigma head (opt-in dtype; see module docstring)


def read_ece_dice(out_dir, calib_name):
    with open(os.path.join(out_dir, calib_name)) as fp:
        rows = list(csv.reader(fp))
    header = rows[0]
    iece, idice = header.index("ece"), header.index("dice")
    return {r[1]: (float(r[iece]), float(r[idice])) for r in rows[1:]}


def assert_gate(f32_dir, bf16_dir, calib_name, gate=GATE):
    f32 = read_ece_dice(f32_dir, calib_name)
    bf16 = read_ece_dice(bf16_dir, calib_name)
    assert set(f32) == set(bf16)
    for subject in f32:
        e32, d32 = f32[subject]
        e16, d16 = bf16[subject]
        assert abs(e32 - e16) <= gate, \
            f"{subject}: bf16 ECE {e16} vs f32 {e32} exceeds the {gate} gate"
        assert abs(d32 - d16) <= gate, \
            f"{subject}: bf16 Dice {d16} vs f32 {d32} exceeds the {gate} gate"


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("bf16gate")
    store = make_store(str(tmp_path / "ds.h5"), nb_subjects=4, nb_slices=8,
                       hw=(32, 32), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02", "s03"])
    return tmp_path, store, split_file


class TestBf16ParityGate:
    def test_mc_headline_strategy(self, env, tmp_path):
        tmp0, store, split_file = env
        loop = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="bf16_mc", epochs=3,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 5}, name="bf16_mc_t")
        cfg.test_data.batch_size = 8
        f32_dir, bf16_dir = str(tmp_path / "f32"), str(tmp_path / "bf16")
        evaluate_direct(cfg, f32_dir, run_id="baseline_mc", masked=False)
        evaluate_direct(cfg, bf16_dir, run_id="baseline_mc", masked=False,
                        dtype="bfloat16")
        assert_gate(f32_dir, bf16_dir, "eval_calibration_baseline_mc.csv")

    def test_ensemble_strategy(self, env, tmp_path):
        """Member-mean softmax confidences behave like the MC ones — the
        stacked-ensemble direct path must clear the same 1e-3 gate at
        bf16."""
        tmp0, store, split_file = env
        unet = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                         "nb_classes": 2, "start_filters": 8}}
        primary = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="bf16_e1", epochs=3, model=unet))
        member = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="bf16_e2", epochs=3, model=unet))
        cfg = base_test_cfg(tmp0, store, split_file,
                            primary.model_files.model_dir,
                            others={"model_dir":
                                    [member.model_files.model_dir],
                                    "test_at": "best"}, name="bf16_e_t")
        cfg.test_data.batch_size = 8
        f32_dir, bf16_dir = str(tmp_path / "f32"), str(tmp_path / "bf16")
        evaluate_direct(cfg, f32_dir, run_id="ensemble", masked=False)
        evaluate_direct(cfg, bf16_dir, run_id="ensemble", masked=False,
                        dtype="bfloat16")
        assert_gate(f32_dir, bf16_dir, "eval_calibration_ensemble.csv")

    def test_aleatoric_envelope(self, env, tmp_path):
        """Sigma heads do NOT reliably clear the 1e-3 production gate at
        bf16 even with the f32 head/epilogue split (see module docstring) —
        bf16 stays opt-in for them. This pins the measured envelope so a
        real bf16 sigma-path regression still fails."""
        tmp0, store, split_file = env
        loop = strategies.train_aleatoric(base_train_cfg(
            tmp0, store, split_file, name="bf16_alea", epochs=3,
            others={"is_log_sigma": False},
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8,
                            "sigma_out": True}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"is_log_sigma": False},
                            name="bf16_alea_t")
        cfg.test_data.batch_size = 8
        f32_dir, bf16_dir = str(tmp_path / "f32"), str(tmp_path / "bf16")
        evaluate_direct(cfg, f32_dir, run_id="aleatoric", masked=False)
        evaluate_direct(cfg, bf16_dir, run_id="aleatoric", masked=False,
                        dtype="bfloat16")
        assert_gate(f32_dir, bf16_dir,
                    "eval_calibration_aleatoric_globalrescale.csv",
                    gate=SIGMA_ENVELOPE)
