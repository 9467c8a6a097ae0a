"""Load-time BN-fold gates (models/unet.fold_bn_params + fold_bn=True).

The fold rewrites ``relu(BN(drop(conv(x, k) + b)))`` into
``relu(drop(conv(x, k*mul) + (b-mean)*mul + bias_bn))`` with
``mul = scale/sqrt(var+eps)`` computed once on the host in f32 — valid only
for deterministic inference (inactive dropout), which is exactly the
single-forward protocol family where flax BatchNorm's f32 promotion of the
activations is the measured bf16 binder. Gates:

- f32 fold is numerically the same function (unit-level allclose on a
  model with non-trivial trained BN stats);
- E2E production bar: bf16 + fast_decoder + fold_bn clears the SAME gates
  as bf16 + fast_decoder (1e-3 for softmax/confidence protocols,
  the measured 2e-3 envelope for the sigma protocol) against the f32
  plain-decoder baseline — the fold adds only weight-rounding-class error;
- the deterministic-only guards fire loudly (mc strategy, train=True,
  mc_dropout=True).
"""
import csv
import os

import jax
import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data.split import save_split
from rcu_tpu.eval.direct import evaluate_direct
from rcu_tpu.models import fold_bn_params, get_model, precast_params
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store

pytestmark = pytest.mark.slow

GATE = 1e-3
SIGMA_ENVELOPE = 2e-3


def read_ece_dice(out_dir, calib_name):
    with open(os.path.join(out_dir, calib_name)) as fp:
        rows = list(csv.reader(fp))
    header = rows[0]
    iece, idice = header.index("ece"), header.index("dice")
    return {r[1]: (float(r[iece]), float(r[idice])) for r in rows[1:]}


def assert_gate(base_dir, fold_dir, calib_name, gate=GATE):
    base = read_ece_dice(base_dir, calib_name)
    fold = read_ece_dice(fold_dir, calib_name)
    assert set(base) == set(fold)
    for subject in base:
        eb, db = base[subject]
        ef, df = fold[subject]
        assert abs(eb - ef) <= gate, \
            f"{subject}: fold ECE {ef} vs base {eb} exceeds the {gate} gate"
        assert abs(db - df) <= gate, \
            f"{subject}: fold Dice {df} vs base {db} exceeds the {gate} gate"


class TestFoldTransform:
    def _trained_state(self, model, steps=8):
        """Params + NON-trivial BN stats: a few train-mode applies move the
        running mean/var off their 0/1 init, so the fold actually folds."""
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 2)) * 3 + 1
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        for i in range(steps):
            xb = jax.random.normal(jax.random.PRNGKey(i + 2),
                                   (4, 16, 16, 2)) * 3 + 1
            _, mut = model.apply(
                {"params": params, "batch_stats": stats}, xb, train=True,
                rngs={"dropout": jax.random.PRNGKey(i)},
                mutable=["batch_stats"])
            stats = mut["batch_stats"]
        return params, stats

    def test_f32_fold_is_same_function(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.2,
                                       sigma_out=True))
        params, stats = self._trained_state(model)
        folded_params, folded_stats = fold_bn_params(params, stats)
        assert folded_stats == {}
        fold_model = model.copy(fold_bn=True)
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 2)) * 3 + 1
        ref = model.apply({"params": params, "batch_stats": stats},
                          x, train=False)
        out = fold_model.apply({"params": folded_params, "batch_stats": {}},
                               x, train=False)
        np.testing.assert_allclose(np.asarray(out.logits),
                                   np.asarray(ref.logits),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.sigma),
                                   np.asarray(ref.sigma),
                                   rtol=2e-4, atol=2e-5)

    def test_postnet_fold_is_same_function(self):
        model = get_model("postnet", dict(nb_classes=2, in_channels=4,
                                          dropout=0.1))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4)) + 0.5
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        for i in range(4):
            _, mut = model.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(i)},
                mutable=["batch_stats"])
            stats = mut["batch_stats"]
        folded_params, folded_stats = fold_bn_params(params, stats)
        fold_model = model.copy(fold_bn=True)
        ref = model.apply({"params": params, "batch_stats": stats},
                          x, train=False)
        out = fold_model.apply({"params": folded_params, "batch_stats": {}},
                               x, train=False)
        np.testing.assert_allclose(np.asarray(out.logits),
                                   np.asarray(ref.logits),
                                   rtol=2e-4, atol=2e-5)

    def test_fold_template_matches_transform(self):
        """model.init of a fold_bn model must produce exactly the tree
        shape fold_bn_params emits (the load path relies on it)."""
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.2))
        params, stats = self._trained_state(model, steps=1)
        folded_params, _ = fold_bn_params(params, stats)
        fold_model = model.copy(fold_bn=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 2))
        tpl = fold_model.init(jax.random.PRNGKey(0), x, train=False)
        assert "batch_stats" not in tpl

        def paths(tree, prefix=""):
            out = set()
            for key, sub in dict(tree).items():
                p = f"{prefix}/{key}"
                if isinstance(sub, dict) or hasattr(sub, "items"):
                    out |= paths(sub, p)
                else:
                    out.add(p)
            return out

        assert paths(tpl["params"]) == paths(folded_params)

    def test_precast_composes_with_fold(self):
        """precast after fold: folded conv kernels cast to bf16, the f32
        sigma head's folded conv stays f32."""
        import jax.numpy as jnp
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.2,
                                       sigma_out=True, dtype="bfloat16"))
        params, stats = self._trained_state(model)
        folded_params, folded_stats = fold_bn_params(params, stats)
        fold_model = model.copy(fold_bn=True)
        cast_p, _ = precast_params(fold_model, folded_params, folded_stats)
        trunk = cast_p["ConvBlock_0"]["ConvBnRelu_0"]["Conv_0"]["kernel"]
        head = cast_p["ConvBnRelu_1"]["Conv_0"]["kernel"]
        assert trunk.dtype == jnp.bfloat16
        assert head.dtype == jnp.float32

    def test_guards(self):
        model = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                       start_filters=4, dropout=0.2,
                                       fold_bn=True))
        x = np.zeros((1, 16, 16, 2), np.float32)
        with pytest.raises(ValueError, match="deterministic-inference"):
            model.init(jax.random.PRNGKey(0), x, train=True)
        with pytest.raises(ValueError, match="deterministic-inference"):
            model.init(jax.random.PRNGKey(0), x, train=False,
                       mc_dropout=True)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("foldbngate")
    store = make_store(str(tmp_path / "ds.h5"), nb_subjects=4, nb_slices=8,
                       hw=(32, 32), channels=4)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02", "s03"])
    return tmp_path, store, split_file


class TestFoldBnE2EGates:
    def test_deterministic_production_gate(self, env, tmp_path):
        tmp0, store, split_file = env
        loop = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="fold_det", epochs=3,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 0}, name="fold_det_t")
        cfg.test_data.batch_size = 8
        base_dir, fold_dir = str(tmp_path / "base"), str(tmp_path / "fold")
        evaluate_direct(cfg, base_dir, run_id="det", masked=False)
        evaluate_direct(cfg, fold_dir, run_id="det", masked=False,
                        dtype="bfloat16", fast_decoder=True, fold_bn=True)
        assert_gate(base_dir, fold_dir, "eval_calibration_det.csv")

    def test_auxiliary_feat_perturbation_gate(self, env, tmp_path):
        """The confidence protocol's per-subject min-max rescale stretches
        the PostNet softmax's (often ~1e-4-wide) range across all 10 ECE
        bins, so the post-rescale ECE amplifies ANY bf16-class rounding to
        ~1e-2 chaotically (measured: plain bf16+fastdec reads 1e-4 on one
        trained model and 5e-3 on another; which variant "wins" flips run
        to run). The meaningful contract is on the RAW maps: on the same
        model and data, the folded model's logit/confidence perturbation vs
        f32 must stay within 2x the established bf16+fastdec opt-in's
        (measured 1.07-1.15x; the rejected single-term bf16-bias fold read
        10-100x here). Dice — bin-free — must still clear the absolute
        production gate E2E."""
        tmp0, store, split_file = env
        segm = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="fold_segm", epochs=3,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        post = strategies.train_auxiliary_feat(base_train_cfg(
            tmp0, store, split_file, name="fold_post", epochs=3,
            others={"model_dir": segm.model_files.model_dir,
                    "test_at": "best"},
            model={"postnet": {"nb_classes": 2, "in_channels": 8}}))
        from rcu_tpu.engine import databuild
        from rcu_tpu.eval.direct import _load_model_state
        cfg = base_test_cfg(tmp0, store, split_file,
                            post.model_files.model_dir,
                            others={"model_dir": segm.model_files.model_dir,
                                    "test_at": "best"}, name="fold_feat_t")
        cfg.test_data.batch_size = 8
        data = databuild.build_data(cfg.test_data, subjects=["s02"], seed=0)
        vol = np.asarray(data.dataset.read_volume("s02", "images"),
                         np.float32)
        probe = (1, 32, 32, 4)

        def confidences(dtype=None, fast=False, fold=False):
            sm, sp, ss = _load_model_state(
                segm.model_files.model_dir, "best", probe,
                provide_features=True, dtype=dtype, fast_decoder=fast,
                fold_bn=fold)
            pm, pp, ps = _load_model_state(
                post.model_files.model_dir, "best", probe, dtype=dtype,
                fast_decoder=fast, fold_bn=fold)
            out = sm.apply({"params": sp, "batch_stats": ss}, vol,
                           train=False)
            feats = out.features.astype(np.float32) if dtype \
                else out.features
            po = pm.apply({"params": pp, "batch_stats": ps}, feats,
                          train=False)
            logits = np.asarray(po.logits, np.float32)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            return (np.asarray(out.logits, np.float32),
                    (e / e.sum(-1, keepdims=True))[..., 1])

        lg_f32, c_f32 = confidences()
        lg_bf16, c_bf16 = confidences(dtype="bfloat16", fast=True)
        lg_fold, c_fold = confidences(dtype="bfloat16", fast=True,
                                      fold=True)
        lg_ff32, c_ff32 = confidences(dtype=None, fast=True, fold=True)
        # f32 fold is the same function (fold algebra exact in f32)
        assert np.abs(lg_ff32 - lg_f32).max() <= 1e-5
        assert np.abs(c_ff32 - c_f32).max() <= 1e-6
        # bf16 fold adds at most 2x the established opt-in's perturbation
        eps = np.finfo(np.float32).tiny
        assert np.abs(lg_fold - lg_f32).max() <= \
            2 * np.abs(lg_bf16 - lg_f32).max() + eps
        assert np.abs(c_fold - c_f32).max() <= \
            2 * np.abs(c_bf16 - c_f32).max() + eps

        # E2E: the run completes and bin-free Dice clears the absolute gate
        base_dir, fold_dir = str(tmp_path / "base"), str(tmp_path / "fold")
        evaluate_direct(cfg, base_dir, run_id="feat", masked=False)
        evaluate_direct(cfg, fold_dir, run_id="feat", masked=False,
                        dtype="bfloat16", fast_decoder=True, fold_bn=True)
        name = "eval_calibration_feat_rescale.csv"
        base, fold = read_ece_dice(base_dir, name), \
            read_ece_dice(fold_dir, name)
        assert set(base) == set(fold)
        for subject in base:
            assert abs(base[subject][1] - fold[subject][1]) <= GATE, \
                f"{subject}: fold Dice delta exceeds the {GATE} gate"

    def test_ensemble_production_gate(self, env, tmp_path):
        """Member-mean softmax (the robust protocol family): every stacked
        member folds at load (_load_ensemble_states) and the vmapped folded
        members must clear the same absolute 1e-3 bar as bf16."""
        tmp0, store, split_file = env
        unet = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                         "nb_classes": 2, "start_filters": 8}}
        primary = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="fold_e1", epochs=3, model=unet))
        member = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="fold_e2", epochs=3, model=unet))
        cfg = base_test_cfg(tmp0, store, split_file,
                            primary.model_files.model_dir,
                            others={"model_dir":
                                    [member.model_files.model_dir],
                                    "test_at": "best"}, name="fold_e_t")
        cfg.test_data.batch_size = 8
        base_dir, fold_dir = str(tmp_path / "base"), str(tmp_path / "fold")
        evaluate_direct(cfg, base_dir, run_id="ens", masked=False)
        evaluate_direct(cfg, fold_dir, run_id="ens", masked=False,
                        dtype="bfloat16", fast_decoder=True, fold_bn=True)
        assert_gate(base_dir, fold_dir, "eval_calibration_ens.csv")

    def test_aleatoric_envelope(self, env, tmp_path):
        tmp0, store, split_file = env
        loop = strategies.train_aleatoric(base_train_cfg(
            tmp0, store, split_file, name="fold_alea", epochs=3,
            others={"is_log_sigma": False},
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8,
                            "sigma_out": True}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"is_log_sigma": False},
                            name="fold_alea_t")
        cfg.test_data.batch_size = 8
        base_dir, fold_dir = str(tmp_path / "base"), str(tmp_path / "fold")
        evaluate_direct(cfg, base_dir, run_id="alea", masked=False)
        evaluate_direct(cfg, fold_dir, run_id="alea", masked=False,
                        dtype="bfloat16", fast_decoder=True, fold_bn=True)
        assert_gate(base_dir, fold_dir,
                    "eval_calibration_alea_globalrescale.csv",
                    gate=SIGMA_ENVELOPE)

    def test_mc_strategy_rejected(self, env, tmp_path):
        tmp0, store, split_file = env
        loop = strategies.train_default(base_train_cfg(
            tmp0, store, split_file, name="fold_mc", epochs=1,
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 8}}))
        cfg = base_test_cfg(tmp0, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 5}, name="fold_mc_t")
        with pytest.raises(ValueError, match="fold_bn covers"):
            evaluate_direct(cfg, str(tmp_path / "out"), run_id="mc",
                            masked=False, fold_bn=True)
