"""Native-2D chunked direct eval vs the (staged-validated) 3-D volume path.

Every strategy's chunked image-batch program must reproduce the volume
program's CSVs on IDENTICAL data: the same arrays are stored once as native
2-D subjects (images (H,W,C)) and once as Z=1 volumes. The 3-D path is
proven against the staged pipeline in tests/test_direct_vs_staged.py, so
equality here transitively validates the 2-D programs (deterministic
forwards -> exact; the default 'proportion' ECE weighting is n_dim-free).
Also covers the latency-mesh padding of mid-chunk heterogeneous parts.
"""
import csv
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data import h5
from rcu_tpu.data.nifti import ImageProperties
from rcu_tpu.data.split import save_split
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.eval.direct import evaluate_direct
from rcu_tpu.parallel import mesh as mesh_lib
from tests.test_strategies import base_test_cfg, base_train_cfg, make_store

pytestmark = pytest.mark.slow

HW = (16, 16)
TEST_SUBJECTS = ["t00", "t01", "t02"]


def _write_pair_stores(tmp, label_channels=1, seed=9):
    """The same test arrays as a native-2D store and as a Z=1 volume store."""
    rng = np.random.RandomState(seed)
    path2d = str(tmp / f"flat{label_channels}.h5")
    path3d = str(tmp / f"vol{label_channels}.h5")
    with h5.DatasetWriter(path2d) as w2, h5.DatasetWriter(path3d) as w3:
        for i, s in enumerate(TEST_SUBJECTS):
            gt = np.zeros(HW, np.uint8)
            gt[4:10 + i, 4:10 + i] = 1
            images = rng.rand(*HW, 3).astype(np.float32) * 0.1
            images[..., 0] += gt
            if label_channels == 2:
                baseline = gt.copy()
                baseline[4:7, 4:7] = 0
                labels = np.stack([gt, baseline], axis=-1)
            else:
                labels = gt
            w2.add_subject(s, {"images": images, "labels": labels},
                           props=ImageProperties(size=(HW[1], HW[0])))
            w3.add_subject(s, {"images": images[None],
                               "labels": labels[None]},
                           props=ImageProperties(size=(HW[1], HW[0], 1)))
    return path2d, path3d


def read_csv(path):
    with open(path) as fp:
        rows = list(csv.reader(fp))
    return rows[0], sorted(rows[1:], key=lambda r: r[1])


def assert_dirs_equal(dir_a, dir_b):
    names = sorted(os.listdir(dir_a))
    assert names == sorted(os.listdir(dir_b))
    for name in names:
        h1, b1 = read_csv(os.path.join(dir_a, name))
        h2, b2 = read_csv(os.path.join(dir_b, name))
        assert h1 == h2, name
        assert len(b1) == len(b2), name
        for r1, r2 in zip(b1, b2):
            for c, (v1, v2) in enumerate(zip(r1, r2)):
                try:
                    np.testing.assert_allclose(
                        float(v1), float(v2), rtol=1e-4, atol=1e-6,
                        err_msg=f"{name} row {r1[1]} col {h1[c]}")
                except ValueError:
                    assert v1 == v2, (name, r1[1], h1[c], v1, v2)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("d2d")
    train_store = make_store(str(tmp / "train3.h5"), channels=3)
    split_file = str(tmp / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02"])
    test_split = str(tmp / "test_split.json")
    save_split(test_split, [], [], TEST_SUBJECTS)
    unet3 = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 3,
                      "nb_classes": 2, "start_filters": 4}}
    baseline = strategies.train_default(base_train_cfg(
        tmp, train_store, split_file, model=unet3, name="d2d_base"))
    flat, vol = _write_pair_stores(tmp)
    return dict(tmp=tmp, train_store=train_store, split_file=split_file,
                test_split=test_split, unet3=unet3, baseline=baseline,
                flat=flat, vol=vol)


def _pair_cfgs(env, name, model_dir, others=None):
    mk = lambda store: base_test_cfg(  # noqa: E731
        env["tmp"], store, env["test_split"], model_dir, others=others,
        name=name)
    cfg2d, cfg3d = mk(env["flat"]), mk(env["vol"])
    cfg2d.test_data.batch_size = 2   # chunks of 2 images (one padded tail)
    cfg3d.test_data.batch_size = 1   # Z=1 volumes
    return cfg2d, cfg3d


def _run_pair(env, tmp_path, cfg2d, cfg3d, run_id, **kw):
    out2d = str(tmp_path / "flat_out")
    out3d = str(tmp_path / "vol_out")
    e2 = evaluate_direct(cfg2d, out2d, run_id=run_id, masked=False, **kw)
    e3 = evaluate_direct(cfg3d, out3d, run_id=run_id, masked=False, **kw)
    assert set(e2) == set(e3) == set(TEST_SUBJECTS)
    assert_dirs_equal(out2d, out3d)
    return out2d


class TestDirect2dMatchesVolumePath:
    def test_deterministic(self, env, tmp_path):
        cfg2d, cfg3d = _pair_cfgs(env, "det",
                                  env["baseline"].model_files.model_dir)
        _run_pair(env, tmp_path, cfg2d, cfg3d, "baseline", mc=0)

    def test_ensemble(self, env, tmp_path):
        member2 = strategies.train_default(base_train_cfg(
            env["tmp"], env["train_store"], env["split_file"],
            model=env["unet3"], name="d2d_m2"))
        cfg2d, cfg3d = _pair_cfgs(
            env, "ens", env["baseline"].model_files.model_dir,
            others={"model_dir": [member2.model_files.model_dir],
                    "test_at": "best"})
        _run_pair(env, tmp_path, cfg2d, cfg3d, "ensemble")

    def test_aleatoric(self, env, tmp_path):
        model = {"unet": {**env["unet3"]["unet"], "sigma_out": True}}
        train = strategies.train_aleatoric(base_train_cfg(
            env["tmp"], env["train_store"], env["split_file"], model=model,
            others={"is_log_sigma": False}, name="d2d_alea"))
        cfg2d, cfg3d = _pair_cfgs(env, "alea", train.model_files.model_dir,
                                  others={"is_log_sigma": False})
        out2d = _run_pair(env, tmp_path, cfg2d, cfg3d, "aleatoric")
        files = sorted(os.listdir(out2d))
        assert "eval_calibration_aleatoric_globalrescale.csv" in files
        assert "eval_summary_minmax_aleatoric.csv" in files

    def test_aleatoric_mesh_matches_single_device(self, env, tmp_path):
        """The chunked 2-D aleatoric programs' latency-mesh shardings (both
        passes) must reproduce the single-device CSVs exactly."""
        model = {"unet": {**env["unet3"]["unet"], "sigma_out": True}}
        train = strategies.train_aleatoric(base_train_cfg(
            env["tmp"], env["train_store"], env["split_file"], model=model,
            others={"is_log_sigma": True}, name="d2d_aleam"))
        cfg = base_test_cfg(env["tmp"], env["flat"], env["test_split"],
                            train.model_files.model_dir,
                            others={"is_log_sigma": True}, name="aleam")
        cfg.test_data.batch_size = 2
        single = str(tmp_path / "single")
        evaluate_direct(cfg, single, run_id="aleatoric", masked=False)
        meshed = str(tmp_path / "mesh")
        evaluate_direct(cfg, meshed, run_id="aleatoric", masked=False,
                        mesh=mesh_lib.make_mesh(n_devices=2))
        assert_dirs_equal(single, meshed)

    def test_auxiliary_feat(self, env, tmp_path):
        postnet = {"postnet": {"in_channels": 4, "nb_classes": 2}}
        train = strategies.train_auxiliary_feat(base_train_cfg(
            env["tmp"], env["train_store"], env["split_file"], model=postnet,
            others={"model_dir": env["baseline"].model_files.model_dir,
                    "test_at": "best"}, name="d2d_feat"))
        cfg2d, cfg3d = _pair_cfgs(
            env, "feat", train.model_files.model_dir,
            others={"model_dir": env["baseline"].model_files.model_dir,
                    "test_at": "best"})
        out2d = _run_pair(env, tmp_path, cfg2d, cfg3d, "auxiliary_feat")
        assert "eval_calibration_auxiliary_feat_rescale.csv" \
            in os.listdir(out2d)

    def test_auxiliary_segm(self, env, tmp_path):
        train_store = make_store(str(env["tmp"] / "train4.h5"), channels=3,
                                 label_channels=2)
        model = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                          "nb_classes": 2, "start_filters": 4}}
        train = strategies.train_auxiliary_segm(base_train_cfg(
            env["tmp"], train_store, env["split_file"], model=model,
            name="d2d_segm"))
        flat, vol = _write_pair_stores(env["tmp"], label_channels=2)
        cfg2d = base_test_cfg(env["tmp"], flat, env["test_split"],
                              train.model_files.model_dir, name="segm")
        cfg3d = base_test_cfg(env["tmp"], vol, env["test_split"],
                              train.model_files.model_dir, name="segm")
        cfg2d.test_data.batch_size = 2
        cfg3d.test_data.batch_size = 1
        _run_pair(env, tmp_path, cfg2d, cfg3d, "auxiliary_segm")

    def test_eval_tree_feeds_isic_analysis(self, env, tmp_path, monkeypatch):
        """The unmasked (ISIC) eval_tree layout writes the ``ece`` category
        dir and IsicResultData + the main table consume a 2-D direct run's
        out_dir unchanged."""
        import importlib.util
        import sys
        from rcu_tpu import directories as dirs
        cfg2d, _ = _pair_cfgs(env, "tree2d",
                              env["baseline"].model_files.model_dir)
        out_dir = str(tmp_path / "tree2d")
        evaluate_direct(cfg2d, out_dir, run_id="baseline", mc=0,
                        masked=False, layout="eval_tree")
        assert os.path.isdir(os.path.join(out_dir, dirs.ECE_NAME))

        monkeypatch.setattr(dirs, "ISIC_EVAL_DIR", out_dir)
        from rcu_tpu.analysis import resultdata as resdata
        data = resdata.IsicResultData()
        assert "baseline" in data.get_ids()

        repo_root = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
        bin_dir = os.path.join(repo_root, "bin")
        if bin_dir not in sys.path:
            sys.path.insert(0, bin_dir)
        spec = importlib.util.spec_from_file_location(
            "d2d_table", os.path.join(bin_dir, "table_ece_ue_bnf_dice.py"))
        table = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(table)
        monkeypatch.setitem(resdata.isic_selection_id_name_dict,
                            "baseline", "baseline")
        df = table.gather_information("isic")
        assert "baseline" in df.index
        assert np.isfinite(df.loc["baseline"]["ece"])

    def test_dispatch_chunks_invariance(self, env, tmp_path):
        """Scanning G K-chunks inside one dispatch (``dispatch_chunks``)
        must not change ANY deterministic CSV — the (n_chunks, K) reshape +
        lax.scan is equal to per-chunk dispatches (the round-trip
        amortization lever for remote links; pipeline program equality is
        pinned in tests/test_pipeline.py)."""
        cfg = base_test_cfg(env["tmp"], env["flat"], env["test_split"],
                            env["baseline"].model_files.model_dir,
                            name="dchunks")
        cfg.test_data.batch_size = 1  # 3 one-image chunks -> one scan of 3
        a, b = str(tmp_path / "g1"), str(tmp_path / "g3")
        evaluate_direct(cfg, a, run_id="baseline", mc=0, masked=False,
                        dispatch_chunks=1)
        evaluate_direct(cfg, b, run_id="baseline", mc=0, masked=False,
                        dispatch_chunks=3)
        assert_dirs_equal(a, b)

    def test_config_mc_zero_means_deterministic(self, env, tmp_path):
        """An explicit ``others: {mc: 0}`` in the CONFIG must select the
        deterministic protocol exactly like the ``mc=0`` kwarg — a falsy-zero
        `.get("mc") or 20` would silently run 20 MC samples under the same
        result id."""
        cfg = base_test_cfg(env["tmp"], env["flat"], env["test_split"],
                            env["baseline"].model_files.model_dir,
                            others={"mc": 0}, name="mc0cfg")
        cfg.test_data.batch_size = 2
        a, b = str(tmp_path / "cfg0"), str(tmp_path / "kwarg0")
        evaluate_direct(cfg, a, run_id="baseline", masked=False)
        evaluate_direct(cfg, b, run_id="baseline", mc=0, masked=False)
        assert_dirs_equal(a, b)

    def test_dispatch_chunks_mc_invariance(self, env, tmp_path):
        """The MC protocol is dispatch-grouping-invariant: every chunk's
        keys derive from its GLOBAL image offset (_host_chunk_keys), so
        grouping G chunks into one scanned dispatch samples the exact same
        MC stream as one-chunk dispatches — CSVs must be equal, not just
        finite."""
        cfg = base_test_cfg(env["tmp"], env["flat"], env["test_split"],
                            env["baseline"].model_files.model_dir,
                            name="dchunks_mc")
        cfg.test_data.batch_size = 2
        a, b = str(tmp_path / "mc_g1"), str(tmp_path / "mc_g2")
        eces = evaluate_direct(cfg, a, run_id="mc", mc=3, masked=False,
                               dispatch_chunks=1)
        evaluate_direct(cfg, b, run_id="mc", mc=3, masked=False,
                        dispatch_chunks=2)
        assert set(eces) == set(TEST_SUBJECTS)
        assert all(np.isfinite(v) for v in eces.values())
        assert_dirs_equal(a, b)

    def test_heterogeneous_chunks_under_latency_mesh(self, env, tmp_path):
        """ADVICE r2 (medium): a MID-chunk same-shape part whose length does
        not divide the mesh's data axis must pad up to it (every part, not
        just the last) instead of raising a jit sharding error. Deterministic
        protocol -> the mesh run must equal the no-mesh run exactly."""
        from PIL import Image
        img_dir = tmp_path / "ISIC-2017_Test_v2_Data"
        gt_dir = tmp_path / "ISIC-2017_Test_v2_Part1_GroundTruth"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        names, sizes = [], [(16, 16), (24, 16), (16, 16)]
        for i, (ih, iw) in enumerate(sizes):
            name = f"ISIC_{i:07d}"
            names.append(name)
            Image.fromarray((rng.rand(ih, iw, 3) * 255).astype(
                np.uint8)).save(str(img_dir / f"{name}.jpg"))
            Image.fromarray(((rng.rand(ih, iw) > 0.5) * 255).astype(
                np.uint8)).save(str(gt_dir / f"{name}_segmentation.png"))
        split2 = str(tmp_path / "het_split.json")
        save_split(split2, [], [], names)
        cfg = base_test_cfg(env["tmp"],
                            str(tmp_path / "ISIC-2017_Test_v2"), split2,
                            env["baseline"].model_files.model_dir,
                            name="hetm")
        cfg.test_data.batch_size = 3  # all three sizes share one chunk
        cfg.test_data.transform = [
            {"rescale": {"lower": 0.0, "upper": 1.0, "entries": ["images"]}}]
        single = str(tmp_path / "het_single")
        evaluate_direct(cfg, single, run_id="baseline", mc=0, masked=False)
        meshed = str(tmp_path / "het_mesh")
        evaluate_direct(cfg, meshed, run_id="baseline", mc=0, masked=False,
                        mesh=mesh_lib.make_mesh(n_devices=2))
        assert_dirs_equal(single, meshed)
