"""fast_decoder production parity gate.

``evaluate_direct(..., fast_decoder=True)`` runs the U-Net with
``split_decoder_concat`` + ``fused_upsample`` (models/unet.py): the decoder
never materializes the skip concats or the 4x-size upsampled activations,
with a param tree bit-identical to the plain model (any checkpoint loads).
Numerics differ only in accumulation order, so the gate is the same bar the
bf16 compute dtype rides (BASELINE.json "ECE/Dice parity to 1e-3"):

- f32 + fast_decoder must match plain f32 per-subject ECE/Dice within 1e-4
  (accumulation-order-only deltas are ~1e-6; the margin covers platforms);
- bf16 + fast_decoder (the production-candidate combination) must match
  plain f32 within the production 1e-3 gate — exactly what
  tests/test_bf16_parity.py certifies for bf16 alone.

The gate covers EVERY protocol family ``bin/eval_direct.py -fast_decoder``
accepts, not just the MC headline (eval/direct.py applies the decoder
rewrite to any U-Net):

- **aleatoric** (sigma protocol, reference brats_test_aleatoric.py:66-69):
  f32+fastdec at 1e-4; bf16+fastdec at the measured sigma envelope
  (tests/test_bf16_parity.py SIGMA_ENVELOPE — sigma heads stay f32/opt-in
  for bf16 regardless of decoder);
- **auxiliary feat/segm** (confidence protocol, reference
  brats_test_auxiliary_feat.py:119-120): f32+fastdec at 1e-4; bf16+fastdec
  at the 1e-3 production gate (confidence = softmax of the PostNet /
  confidence-unet — softmax confidences clear 1e-3 like the MC family).
"""
import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.eval.direct import evaluate_direct
from tests.test_bf16_parity import GATE, SIGMA_ENVELOPE, assert_gate
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("fastdec")
    store = make_store(str(tmp_path / "ds.h5"), nb_subjects=3, nb_slices=8,
                       hw=(32, 32), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    loop = strategies.train_default(base_train_cfg(
        tmp_path, store, split_file, name="fastdec_mc", epochs=3,
        model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                        "nb_classes": 2, "start_filters": 8}}))
    return tmp_path, store, split_file, loop.model_files.model_dir


class TestFastDecoderGate:
    def _cfg(self, env):
        tmp0, store, split_file, model_dir = env
        cfg = base_test_cfg(tmp0, store, split_file, model_dir,
                            others={"mc": 5}, name="fastdec_t")
        cfg.test_data.batch_size = 8
        return cfg

    def test_f32_parity(self, env, tmp_path):
        cfg = self._cfg(env)
        base_dir, fast_dir = str(tmp_path / "base"), str(tmp_path / "fast")
        evaluate_direct(cfg, base_dir, run_id="mc", masked=False)
        evaluate_direct(cfg, fast_dir, run_id="mc", masked=False,
                        fast_decoder=True)
        assert_gate(base_dir, fast_dir, "eval_calibration_mc.csv", gate=1e-4)

    def test_bf16_fast_decoder_production_gate(self, env, tmp_path):
        cfg = self._cfg(env)
        base_dir = str(tmp_path / "f32_base")
        fast_dir = str(tmp_path / "bf16_fast")
        evaluate_direct(cfg, base_dir, run_id="mc", masked=False)
        evaluate_direct(cfg, fast_dir, run_id="mc", masked=False,
                        dtype="bfloat16", fast_decoder=True)
        assert_gate(base_dir, fast_dir, "eval_calibration_mc.csv", gate=GATE)


class TestFastDecoderSigmaProtocol:
    """Aleatoric family under the fast decoder (the sigma head rides the
    same decoder trunk; the rewrite must not perturb the predicted-class
    sigma protocol beyond accumulation order)."""

    @pytest.fixture(scope="class")
    def alea_env(self, env, tmp_path_factory):
        tmp0, store, split_file, _ = env
        tmp_path = tmp_path_factory.mktemp("fastdec_alea")
        loop = strategies.train_aleatoric(base_train_cfg(
            tmp0, store, split_file, name="fastdec_alea", epochs=3,
            others={"is_log_sigma": False},
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8,
                            "sigma_out": True}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"is_log_sigma": False},
                            name="fastdec_alea_t")
        cfg.test_data.batch_size = 8
        base_dir = str(tmp_path / "f32_base")
        evaluate_direct(cfg, base_dir, run_id="aleatoric", masked=False)
        return cfg, base_dir

    def test_f32_parity(self, alea_env, tmp_path):
        cfg, base_dir = alea_env
        fast_dir = str(tmp_path / "fast")
        evaluate_direct(cfg, fast_dir, run_id="aleatoric", masked=False,
                        fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_aleatoric_globalrescale.csv",
                    gate=1e-4)

    def test_bf16_fast_decoder_envelope(self, alea_env, tmp_path):
        """bf16 stays OPT-IN for sigma heads (test_bf16_parity measured
        envelope); the fast decoder must not widen that envelope."""
        cfg, base_dir = alea_env
        fast_dir = str(tmp_path / "bf16_fast")
        evaluate_direct(cfg, fast_dir, run_id="aleatoric", masked=False,
                        dtype="bfloat16", fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_aleatoric_globalrescale.csv",
                    gate=SIGMA_ENVELOPE)


class TestFastDecoderConfidenceProtocols:
    """Auxiliary feat/segm families under the fast decoder."""

    @pytest.fixture(scope="class")
    def feat_env(self, env, tmp_path_factory):
        tmp0, store, split_file, baseline_dir = env
        tmp_path = tmp_path_factory.mktemp("fastdec_feat")
        train = strategies.train_auxiliary_feat(base_train_cfg(
            tmp0, store, split_file, name="fastdec_feat", epochs=3,
            model={"postnet": {"in_channels": 8, "nb_classes": 2}},
            others={"model_dir": baseline_dir, "test_at": "best"}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            train.model_files.model_dir,
                            others={"model_dir": baseline_dir,
                                    "test_at": "best"},
                            name="fastdec_feat_t")
        cfg.test_data.batch_size = 8
        base_dir = str(tmp_path / "f32_base")
        evaluate_direct(cfg, base_dir, run_id="auxiliary_feat", masked=False)
        return cfg, base_dir

    def test_feat_f32_parity(self, feat_env, tmp_path):
        cfg, base_dir = feat_env
        fast_dir = str(tmp_path / "fast")
        evaluate_direct(cfg, fast_dir, run_id="auxiliary_feat", masked=False,
                        fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_auxiliary_feat_rescale.csv", gate=1e-4)

    def test_feat_bf16_fast_decoder_production_gate(self, feat_env, tmp_path):
        cfg, base_dir = feat_env
        fast_dir = str(tmp_path / "bf16_fast")
        evaluate_direct(cfg, fast_dir, run_id="auxiliary_feat", masked=False,
                        dtype="bfloat16", fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_auxiliary_feat_rescale.csv", gate=GATE)

    @pytest.fixture(scope="class")
    def segm_env(self, env, tmp_path_factory):
        tmp0, _, split_file, _ = env
        tmp_path = tmp_path_factory.mktemp("fastdec_segm")
        # aux-segm store: labels = [gt, baseline-pred] (the prediction-merge
        # layout, reference create_brats18_dataset.py:165-176); inputs are
        # images (+) prediction -> in_channels 5
        wpred = make_store(str(tmp_path / "wpred.h5"), nb_subjects=3,
                           nb_slices=8, hw=(32, 32), channels=4,
                           label_channels=2)
        train = strategies.train_auxiliary_segm(base_train_cfg(
            tmp0, wpred, split_file, name="fastdec_segm", epochs=3,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 5,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp0, wpred, split_file,
                            train.model_files.model_dir,
                            name="fastdec_segm_t")
        cfg.test_data.batch_size = 8
        base_dir = str(tmp_path / "f32_base")
        evaluate_direct(cfg, base_dir, run_id="auxiliary_segm", masked=False)
        return cfg, base_dir

    def test_segm_f32_parity(self, segm_env, tmp_path):
        cfg, base_dir = segm_env
        fast_dir = str(tmp_path / "fast")
        evaluate_direct(cfg, fast_dir, run_id="auxiliary_segm", masked=False,
                        fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_auxiliary_segm_rescale.csv", gate=1e-4)

    def test_segm_bf16_fast_decoder_production_gate(self, segm_env, tmp_path):
        cfg, base_dir = segm_env
        fast_dir = str(tmp_path / "bf16_fast")
        evaluate_direct(cfg, fast_dir, run_id="auxiliary_segm", masked=False,
                        dtype="bfloat16", fast_decoder=True)
        assert_gate(base_dir, fast_dir,
                    "eval_calibration_auxiliary_segm_rescale.csv", gate=GATE)


class TestConfigLevelTrainingOptIn:
    def test_train_and_eval_with_fast_decoder_config(self, tmp_path):
        """Config-level opt-in: model params carry the two flags straight
        into UNet(**params) (models/registry.get_model), the train step
        differentiates the split/fused convs, the checkpoint records the
        flags, and the direct eval reloads the model with them on."""
        store = make_store(str(tmp_path / "ds.h5"), nb_subjects=3,
                           nb_slices=8, hw=(32, 32), channels=4)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        loop = strategies.train_default(base_train_cfg(
            tmp_path, store, split_file, name="fastdec_train", epochs=2,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8,
                            "split_decoder_concat": True,
                            "fused_upsample": True}}))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="fastdec_train_t")
        cfg.test_data.batch_size = 8
        out = str(tmp_path / "eval")
        eces = evaluate_direct(cfg, out, run_id="mc", masked=False)
        assert eces and all(np.isfinite(v) for v in eces.values())
