"""int8 PTQ gate (ops/quant.py + models/unet.py quant path).

Same methodology as the bf16 compute dtype (tests/test_bf16_parity.py) and
the fast decoder (tests/test_fast_decoder.py): the int8 path is an opt-in
inference rewrite with an IDENTICAL param tree (any checkpoint loads), so
the tests pin (a) structural equivalence at the unit level and (b) the
measured end-to-end envelope of the production combination
(bf16 epilogue + fast decoder + int8 trunk) against plain f32 through the
full direct-eval pipeline — the BASELINE bar is 1e-3 ECE/Dice.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcu_tpu.models.unet import UNet
from rcu_tpu.ops import quant as quant_ops

KW = dict(nb_classes=2, in_channels=4, depth=3, start_filters=8,
          dropout=0.05)


def _calibrated(base_kw, x, key=0):
    model = UNet(**base_kw)
    variables = model.init({"params": jax.random.PRNGKey(key)}, x,
                           train=False)
    scales = quant_ops.calibrate_scales(model, variables, [x])
    return model, variables, scales


class TestQuantUnits:
    def test_param_tree_bit_identical(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        base, vb, scales = _calibrated(KW, x)
        quant = UNet(**KW, quant_scales=scales)
        vq = quant.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert (jax.tree_util.tree_structure(vb)
                == jax.tree_util.tree_structure(vq))
        for a, b in zip(jax.tree_util.tree_leaves(vb),
                        jax.tree_util.tree_leaves(vq)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("extra", [
        {}, {"split_decoder_concat": True, "fused_upsample": True}])
    def test_forward_close_same_dropout_mask(self, extra):
        """Quantized forward tracks the plain forward closely under the SAME
        dropout sample (identical module paths -> identical RNG folding);
        random-init activations quantize to ~3e-4 max softmax error."""
        kw = {**KW, **extra}
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        base, v, scales = _calibrated(kw, x)
        quant = UNet(**kw, quant_scales=scales)
        rngs = {"dropout": jax.random.PRNGKey(2)}
        a = base.apply(v, x, train=False, mc_dropout=True, rngs=rngs)
        b = quant.apply(v, x, train=False, mc_dropout=True, rngs=rngs)
        pa = jax.nn.softmax(a.logits, -1)
        pb = jax.nn.softmax(b.logits, -1)
        assert float(jnp.max(jnp.abs(pa - pb))) < 5e-3
        # the heads are deliberately unquantized: logits stay f32
        assert b.logits.dtype == jnp.float32

    def test_calibration_max_merges_batches(self):
        x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        x2 = 3.0 * jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 4))
        model = UNet(**KW)
        v = model.init({"params": jax.random.PRNGKey(0)}, x1, train=False)
        s_small = quant_ops.calibrate_scales(model, v, [x1],
                                             mc_dropout=False)
        s_both = quant_ops.calibrate_scales(model, v, [x1, x2],
                                            mc_dropout=False)
        assert set(s_small) == set(s_both)
        # the hotter batch can only widen scales, never shrink them
        assert all(s_both[k] >= s_small[k] - 1e-12 for k in s_small)

    def test_topology_mismatch_fails_loudly(self):
        """Scales calibrated on the plain decoder must not silently drive a
        fast-decoder model — the split sites sow DIFFERENT keys."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        _, v, scales = _calibrated(KW, x)
        wrong = UNet(**KW, split_decoder_concat=True, fused_upsample=True,
                     quant_scales=scales)
        with pytest.raises(KeyError, match="calibrate"):
            wrong.apply(v, x, train=False)

    def test_residual_models_rejected(self):
        with pytest.raises(NotImplementedError, match="residual"):
            UNet(**KW, residual=True, quant_scales={"x": 1.0}).init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 32, 32, 4)), train=False)

    def test_ensemble_union_scales_cover_every_member(self):
        """Ensemble int8 (eval/direct._calibrated_quant_model ensemble=True)
        merges per-member scales by max: the shared dict must dominate each
        member's own calibration, and the quantized member-mean probabilities
        must track f32 closely (deterministic forward, no dropout)."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        model = UNet(**KW)
        members = [model.init({"params": jax.random.PRNGKey(k)}, x,
                              train=False) for k in (1, 2)]
        per_member = [quant_ops.calibrate_scales(model, v, [x],
                                                 mc_dropout=False)
                      for v in members]
        union = {k: max(s[k] for s in per_member) for k in per_member[0]}
        for s in per_member:
            assert set(s) == set(union)
            assert all(union[k] >= s[k] - 1e-12 for k in s)
        quant = UNet(**KW, quant_scales=union)

        def mean_probs(m):
            probs = [jax.nn.softmax(m.apply(v, x, train=False).logits, -1)
                     for v in members]
            return jnp.mean(jnp.stack(probs), axis=0)

        err = jnp.max(jnp.abs(mean_probs(model) - mean_probs(quant)))
        assert float(err) < 5e-3

    def test_skip_levels_structural(self):
        """quant_skip_levels keeps the N finest levels in the compute dtype:
        the jaxpr loses exactly the full-resolution int8 conv sites per
        skipped level, and skip=depth+1 reproduces the PLAIN model bitwise
        (the selection is structural, not numeric). The production default
        (ops/quant.DEFAULT_SKIP_LEVELS) is measurement-backed: int8 loses
        to bf16 at the full-resolution small-channel level
        (scripts/conv_stack_attribution.py --int8)."""
        kw = {**KW, "split_decoder_concat": True, "fused_upsample": True}
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        base, v, scales = _calibrated(kw, x)
        rngs = {"dropout": jax.random.PRNGKey(2)}

        def n_int8_convs(m):
            jaxpr = jax.make_jaxpr(lambda vv, xx: m.apply(
                vv, xx, train=False, mc_dropout=True, rngs=rngs).logits)(v, x)
            return str(jaxpr).count("preferred_element_type=int32")

        counts = {}
        for skip in (0, 1, 2, KW["depth"] + 1):
            m = UNet(**kw, quant_scales=scales, quant_skip_levels=skip)
            counts[skip] = n_int8_convs(m)
        # level 0 of the fast decoder carries 7 int8 convs (enc a+b, the
        # split dec-a pair, dec b, head, fused up-conv); level 1 carries 7
        # more; skipping every level leaves none
        assert counts[0] > counts[1] > counts[2] > 0
        assert counts[0] - counts[1] == 7
        assert counts[KW["depth"] + 1] == 0
        full_skip = UNet(**kw, quant_scales=scales,
                         quant_skip_levels=KW["depth"] + 1)
        a = base.apply(v, x, train=False, mc_dropout=True, rngs=rngs).logits
        b = full_skip.apply(v, x, train=False, mc_dropout=True,
                            rngs=rngs).logits
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_skip_levels_validated(self):
        x = jnp.zeros((1, 32, 32, 4))
        with pytest.raises(ValueError, match="quant_skip_levels"):
            UNet(**KW, quant_scales={"x": 1.0},
                 quant_skip_levels=KW["depth"] + 2).init(
                {"params": jax.random.PRNGKey(0)}, x, train=False)
        with pytest.raises(ValueError, match="quant_skip_levels"):
            UNet(**KW, quant_skip_levels=-1).init(
                {"params": jax.random.PRNGKey(0)}, x, train=False)

    def test_clipped_fraction_unit(self):
        x = jnp.asarray([0.0, 1.0, -2.0, 0.5])
        # scale 1/127 -> saturation threshold |x| > 1.0 (strict): only -2.0
        frac = quant_ops.clipped_fraction(x, 1.0 / 127.0)
        assert float(frac) == 0.25
        assert float(quant_ops.clipped_fraction(x, 1.0)) == 0.0

    def test_clip_report_flags_hotter_eval_batch(self):
        """The distribution-shift diagnostic: a quantized model applied to
        the calibration batch clips NOTHING (the margin covers it); applied
        to a deliberately hotter batch, the input-site clipped fraction is
        nonzero and observable instead of silently degrading accuracy."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        model = UNet(**KW)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        scales = quant_ops.calibrate_scales(model, v, [x], mc_dropout=False)
        quant = UNet(**KW, quant_scales=scales)
        calm = quant_ops.clip_report(quant, v, [x], mc_dropout=False)
        # every calibrated site reports a stat, and none clip at margin 1.1
        assert set(calm) == set(scales)
        assert max(calm.values()) == 0.0
        hot = quant_ops.clip_report(quant, v, [2.5 * x], mc_dropout=False)
        assert max(hot.values()) > 0.01, hot
        # the report names the clipping sites so the shift is localizable
        assert any("Conv_0_in_absmax" in k for k, f in hot.items() if f > 0)

    def test_clip_report_requires_quantized_model(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        model = UNet(**KW)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        with pytest.raises(ValueError, match="quant_clip"):
            quant_ops.clip_report(model, v, [x], mc_dropout=False)

    def test_calibration_shift_keeps_probs_bounded(self):
        """Calibrate on batch A, evaluate on a hotter batch B: symmetric
        clipping saturates rather than wraps, so the quantized softmax
        stays within a bounded (looser) envelope of the plain forward even
        under a 1.5x activation shift — and the clip_report makes the shift
        observable."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
        model = UNet(**KW)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        scales = quant_ops.calibrate_scales(model, v, [x], mc_dropout=False)
        quant = UNet(**KW, quant_scales=scales)
        hot = 1.5 * x
        pa = jax.nn.softmax(model.apply(v, hot, train=False).logits, -1)
        pb = jax.nn.softmax(quant.apply(v, hot, train=False).logits, -1)
        # looser than the in-distribution 5e-3 bound, but bounded: the
        # 1.5x shift is ~1.36x past the 1.1 margin
        assert float(jnp.max(jnp.abs(pa - pb))) < 5e-2
        report = quant_ops.clip_report(quant, v, [hot], mc_dropout=False)
        assert max(report.values()) > 0.0

    def test_quant_ops_roundtrip(self):
        # weights: per-output-channel symmetric; dequant(quant(w)) ~ w
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
        q, s = quant_ops.quantize_weight(k)
        assert q.dtype == jnp.int8 and s.shape == (16,)
        back = np.asarray(q, np.float32) * np.asarray(s)
        np.testing.assert_allclose(back, np.asarray(k),
                                   atol=float(np.max(np.asarray(s))) / 2 + 1e-6)
        # activations: saturating round-to-nearest
        x = jnp.asarray([-1e9, -1.0, 0.0, 0.4, 1e9])
        xa = quant_ops.quantize_activation(x, scale=1.0 / 10)
        np.testing.assert_array_equal(np.asarray(xa), [-127, -10, 0, 4, 127])


@pytest.mark.slow
class TestQuantE2EEnvelope:
    """The production int8 combination through the SHIPPED direct pipeline:
    train a tiny MC model, evaluate plain f32 vs quantize=True, compare the
    per-subject ECE/Dice CSVs. The envelope below is MEASURED (round 4);
    the assert keeps it pinned so a real int8 regression fails loudly."""

    def test_mc_envelope(self, tmp_path):
        from rcu_tpu import strategies
        from rcu_tpu.data.split import save_split
        from rcu_tpu.eval.direct import evaluate_direct
        from tests.test_bf16_parity import assert_gate
        from tests.test_strategies import (base_test_cfg, base_train_cfg,
                                           make_store)
        store = make_store(str(tmp_path / "ds.h5"), nb_subjects=3,
                           nb_slices=8, hw=(32, 32), channels=4)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        loop = strategies.train_default(base_train_cfg(
            tmp_path, store, split_file, name="quant_mc", epochs=3,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 5}, name="quant_t")
        cfg.test_data.batch_size = 8
        base_dir = str(tmp_path / "f32_base")
        q_dir = str(tmp_path / "int8")
        evaluate_direct(cfg, base_dir, run_id="mc", masked=False)
        evaluate_direct(cfg, q_dir, run_id="mc", masked=False,
                        dtype="bfloat16", fast_decoder=True, quantize=True)
        assert_gate(base_dir, q_dir, "eval_calibration_mc.csv", gate=1e-3)

    def test_mc_envelope_2d(self, tmp_path):
        """The native-2D (ISIC-protocol) branch of the int8 path: the
        calibration batch is built from whole images, not volume slices
        (eval/direct._calibrated_quant_model is_2d), and the chunked
        image-batch program runs the quantized trunk."""
        from rcu_tpu import strategies
        from rcu_tpu.data.split import save_split
        from rcu_tpu.eval.direct import evaluate_direct
        from tests.test_bf16_parity import assert_gate
        from tests.test_direct_2d import TEST_SUBJECTS, _write_pair_stores
        from tests.test_strategies import (base_test_cfg, base_train_cfg,
                                           make_store)
        train_store = make_store(str(tmp_path / "train3.h5"), channels=3)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        test_split = str(tmp_path / "test_split.json")
        save_split(test_split, [], [], TEST_SUBJECTS)
        unet3 = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 3,
                          "nb_classes": 2, "start_filters": 8}}
        loop = strategies.train_default(base_train_cfg(
            tmp_path, train_store, split_file, model=unet3, name="q2d",
            epochs=3))
        flat, _ = _write_pair_stores(tmp_path)
        cfg = base_test_cfg(tmp_path, flat, test_split,
                            loop.model_files.model_dir,
                            others={"mc": 5}, name="q2d_t")
        cfg.test_data.batch_size = 2
        base_dir = str(tmp_path / "f32_base")
        q_dir = str(tmp_path / "int8")
        evaluate_direct(cfg, base_dir, run_id="mc", masked=False)
        evaluate_direct(cfg, q_dir, run_id="mc", masked=False,
                        dtype="bfloat16", fast_decoder=True, quantize=True)
        assert_gate(base_dir, q_dir, "eval_calibration_mc.csv", gate=1e-3)

    def test_ensemble_envelope(self, tmp_path):
        """Ensemble int8 through the SHIPPED direct pipeline: two trained
        members, plain f32 vs quantize=True (union calibration), per-subject
        ECE/Dice CSVs inside the 1e-3 BASELINE bar — and the same quantized
        program under the EP 2-D model x data mesh must match the
        single-device quantized CSVs to float tolerance (the vmapped and
        shard_mapped member reductions order the int8 dequant epilogue
        differently, so ~1e-5 relative, not the bit-exactness of the
        unquantized EP path in test_direct_vs_staged)."""
        from rcu_tpu import strategies
        from rcu_tpu.data.split import save_split
        from rcu_tpu.eval.direct import evaluate_direct
        from rcu_tpu.parallel import ensemble as ens_lib
        from tests.test_bf16_parity import assert_gate
        from tests.test_strategies import (base_test_cfg, base_train_cfg,
                                           make_store)

        def csv_close(path_a, path_b, rtol=1e-4):
            import csv as csv_lib
            with open(path_a) as fa, open(path_b) as fb:
                rows_a = list(csv_lib.reader(fa))
                rows_b = list(csv_lib.reader(fb))
            assert len(rows_a) == len(rows_b), (path_a, path_b)
            for row_a, row_b in zip(rows_a, rows_b):
                assert len(row_a) == len(row_b), (path_a, row_a, row_b)
                for cell_a, cell_b in zip(row_a, row_b):
                    try:
                        np.testing.assert_allclose(
                            float(cell_a), float(cell_b), rtol=rtol,
                            atol=1e-6, err_msg=path_a)
                    except ValueError:
                        assert cell_a == cell_b, (path_a, cell_a, cell_b)
        store = make_store(str(tmp_path / "ds.h5"), nb_subjects=3,
                           nb_slices=8, hw=(32, 32), channels=4)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        unet = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                         "nb_classes": 2, "start_filters": 8}}
        m1 = strategies.train_default(base_train_cfg(
            tmp_path, store, split_file, name="qens_m1", epochs=3,
            model=unet))
        cfg_m2 = base_train_cfg(tmp_path, store, split_file, name="qens_m2",
                                epochs=3, model=unet)
        cfg_m2.seed = 21  # distinct init: members must not be twins
        m2 = strategies.train_default(cfg_m2)
        cfg = base_test_cfg(
            tmp_path, store, split_file, m1.model_files.model_dir,
            others={"model_dir": [m2.model_files.model_dir],
                    "test_at": "best"}, name="qens_t")
        cfg.test_data.batch_size = 8
        base_dir = str(tmp_path / "f32_base")
        q_dir = str(tmp_path / "int8")
        evaluate_direct(cfg, base_dir, run_id="ensemble", masked=False)
        evaluate_direct(cfg, q_dir, run_id="ensemble", masked=False,
                        dtype="bfloat16", fast_decoder=True, quantize=True)
        assert_gate(base_dir, q_dir, "eval_calibration_ensemble.csv",
                    gate=1e-3)
        ep_dir = str(tmp_path / "int8_ep")
        evaluate_direct(cfg, ep_dir, run_id="ensemble", masked=False,
                        dtype="bfloat16", fast_decoder=True, quantize=True,
                        mesh=ens_lib.make_ensemble_mesh(2))
        assert sorted(os.listdir(q_dir)) == sorted(os.listdir(ep_dir))
        for name in sorted(os.listdir(q_dir)):
            csv_close(os.path.join(q_dir, name),
                      os.path.join(ep_dir, name))

    def test_clip_debug_warns_on_shifted_test_subject(self, tmp_path,
                                                      monkeypatch, caplog):
        """RCU_QUANT_CLIP_DEBUG=1 through the SHIPPED driver: calibration
        runs on the FIRST test subject; a deliberately 4x-hotter LAST test
        subject (a real calibration/eval distribution shift) must produce a
        clip-report WARNING naming the saturating sites — the shift is
        observable, not silent (round-5 hardening of the single-batch
        calibration scheme)."""
        import h5py  # noqa: F401  (store written via the framework writer)
        from rcu_tpu import strategies
        from rcu_tpu.data import h5
        from rcu_tpu.data.nifti import ImageProperties
        from rcu_tpu.data.split import save_split
        from rcu_tpu.eval.direct import evaluate_direct
        from tests.test_strategies import base_test_cfg, base_train_cfg

        rng = np.random.RandomState(3)
        store = str(tmp_path / "ds.h5")
        with h5.DatasetWriter(store) as w:
            for i, hot in enumerate([1.0, 1.0, 1.0, 4.0]):
                gt = np.zeros((8, 32, 32), np.uint8)
                gt[:, 8:24, 8:24] = 1
                images = rng.rand(8, 32, 32, 4).astype(np.float32) * 0.1
                images[..., 0] += gt
                images *= hot  # s03 runs 4x hotter than the others
                w.add_subject(f"s{i:02d}",
                              {"images": images, "labels": gt},
                              props=ImageProperties(size=(32, 32, 8)))
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02", "s03"])
        loop = strategies.train_default(base_train_cfg(
            tmp_path, store, split_file, name="clipdbg", epochs=2,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="clipdbg_t")
        cfg.test_data.batch_size = 8
        monkeypatch.setenv("RCU_QUANT_CLIP_DEBUG", "1")
        with caplog.at_level("INFO"):
            evaluate_direct(cfg, str(tmp_path / "q"), run_id="mc",
                            masked=False, quantize=True)
        clip_logs = [r for r in caplog.records
                     if "int8 clip report" in r.getMessage()]
        assert clip_logs, "debug mode must emit the clip report"
        assert clip_logs[0].levelname == "WARNING", clip_logs[0].getMessage()
        assert "s03" in clip_logs[0].getMessage()

    def test_rejected_strategies(self, tmp_path):
        from rcu_tpu.eval.direct import evaluate_direct
        from rcu_tpu.engine import config as cfg_lib
        cfg = cfg_lib.TestConfiguration(model_dir="", others={})
        with pytest.raises((ValueError, Exception)):
            evaluate_direct(cfg, str(tmp_path), quantize=True,
                            strategy="aleatoric")
