"""Direct one-pass eval vs the staged test->eval_uncertainty chain.

For every deterministic-forward strategy (deterministic baseline, ensemble,
auxiliary feat/segm, aleatoric) the direct fused program must reproduce the
staged pipeline's CSVs EXACTLY (same checkpoints, same data, no sampling):
``*_test_*`` writes NIfTI artifacts, the staged eval actions re-read them,
and the direct path computes the same rows in one dispatch per subject.
MC-dropout equality is covered separately (tests/test_direct_eval.py): its
RNG schedules differ by construction between the two pipelines.
"""
import csv
import importlib.util
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data import h5, nifti
from rcu_tpu.data import split as split_lib
from rcu_tpu.data.nifti import ImageProperties
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.eval import actions as act_lib
from rcu_tpu.eval import analysis, evaldata
from rcu_tpu.eval.direct import evaluate_direct
from rcu_tpu import directories as dirs

pytestmark = pytest.mark.slow

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBJECTS = [f"Brats18_INT_{i:02d}_1" for i in range(4)]
Z, H, W = 2, 16, 16


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _train_cfg(tmp, store, split_file, name, model, others=None, epochs=2):
    return cfg_lib.TrainConfiguration(
        epochs=epochs, seed=20, split=split_file, train_dir=str(tmp / "out"),
        train_name=name, model=cfg_lib.ParametricNode.parse(model),
        optimizer=cfg_lib.ParametricNode.parse({"adam": {"lr": 0.002}}),
        train_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 4, "dataset": store, "indexing": {"slice": {}},
             "shuffle": True}),
        valid_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 4, "dataset": store, "indexing": {"slice": {}},
             "shuffle": False}),
        others=others or {})


def _test_cfg(tmp, store, split_file, model_dir, name, others=None):
    return cfg_lib.TestConfiguration(
        seed=20, split=split_file, model_dir=model_dir, test_name=name,
        test_dir=str(tmp / "pred"), test_at="best",
        test_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 2, "dataset": store, "indexing": {"slice": {}},
             "shuffle": False}),
        others=others or {})


def run_staged_eval(run_dir, eval_id, confidence_entry, eval_dir, gt_dir,
                    split_file):
    """The staged offline eval exactly as bin/eval_uncertainty.py drives it
    (BraTS wiring: foreground-masked ECE)."""
    entry = evaldata.EvalData(eval_id, run_dir, confidence_entry)
    entry = evaldata.get_brats_data(entry, in_dir=gt_dir,
                                    split_file=split_file)
    min_max_dir = os.path.join(eval_dir, dirs.MINMAX_NAME)
    for action in act_lib.get_actions(["minmax", "ece_dice", "calib",
                                       "bnf_ue"],
                                      min_max_dir, eval_dir, "foreground"):
        action.setup_eval(entry)
        action.start_eval()
        loader = analysis.Loader()
        for sf in entry.subject_files:
            action.eval_subject(sf, loader)
        action.finish_eval()
    return eval_dir


def read_rows(path):
    with open(path) as fp:
        rows = list(csv.reader(fp))
    header, body = rows[0], rows[1:]
    return header, {r[1]: dict(zip(header, r)) for r in body}


def assert_csv_equal(staged_path, direct_path, rtol=1e-4, atol=1e-6):
    h1, rows1 = read_rows(staged_path)
    h2, rows2 = read_rows(direct_path)
    assert h1 == h2, (staged_path, direct_path)
    assert set(rows1) == set(rows2)
    for subject, row1 in rows1.items():
        row2 = rows2[subject]
        for col in h1:
            v1, v2 = row1[col], row2[col]
            try:
                np.testing.assert_allclose(
                    float(v1), float(v2), rtol=rtol, atol=atol,
                    err_msg=f"{os.path.basename(staged_path)} "
                            f"{subject}/{col}")
            except ValueError:
                assert v1 == v2, (staged_path, subject, col, v1, v2)


def assert_family_equal(eval_dir, direct_dir, result_id, run_id):
    """Compare the calibration CSV, the ece_dice CSV, all 11 uncertainty
    CSVs and the minmax summary between a staged eval dir (nested layout)
    and a direct out dir (flat layout)."""
    assert_csv_equal(
        os.path.join(eval_dir, dirs.CALIB_NAME,
                     dirs.CALIBRATION_PLACEHOLDER.format(result_id)),
        os.path.join(direct_dir,
                     dirs.CALIBRATION_PLACEHOLDER.format(result_id)))
    assert_csv_equal(
        os.path.join(eval_dir, dirs.ECE_FOREGROUND_NAME,
                     dirs.ECE_PLACEHOLDER.format(result_id)),
        os.path.join(direct_dir, dirs.ECE_PLACEHOLDER.format(result_id)))
    for threshold in (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
                      0.95):
        tstr = f"{threshold:.2f}".replace(".", "")
        assert_csv_equal(
            os.path.join(eval_dir, dirs.UNCERTAINTY_NAME,
                         dirs.UNCERTAINTY_PLACEHOLDER.format(result_id,
                                                             tstr)),
            os.path.join(direct_dir,
                         dirs.UNCERTAINTY_PLACEHOLDER.format(result_id,
                                                             tstr)))
    staged_mm = os.path.join(eval_dir, dirs.MINMAX_NAME,
                             dirs.MINMAX_PLACEHOLDER.format(run_id))
    direct_mm = os.path.join(direct_dir,
                             dirs.MINMAX_PLACEHOLDER.format(run_id))
    with open(staged_mm) as f1, open(direct_mm) as f2:
        r1 = list(csv.reader(f1))
        r2 = list(csv.reader(f2))
    assert r1[0] == r2[0]
    assert r1[1][0] == r2[1][0]
    np.testing.assert_allclose([float(x) for x in r1[1][1:]],
                               [float(x) for x in r2[1][1:]],
                               rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dvs")
    rng = np.random.RandomState(7)

    # raw BraTS-layout GT tree; per-subject varying blobs + real t2 support
    gt_dir = tmp / "Training"
    gts = {}
    for i, s in enumerate(SUBJECTS):
        d = gt_dir / ("HGG" if i < 2 else "LGG") / s
        d.mkdir(parents=True)
        seg = np.zeros((Z, H, W), np.uint8)
        seg[:, 4:10 + i, 4:10 + i] = 4
        gts[s] = (seg > 0).astype(np.uint8)
        for e in ("flair", "t1", "t1ce", "t2"):
            img = rng.rand(Z, H, W).astype(np.float32) + 0.2
            if e == "flair":
                img += 2.0 * (seg > 0)
            if e == "t2":
                img[img < 0.45] = 0.0  # head-support zeros for the fg mask
            nifti.write(img, str(d / f"{s}_{e}.nii.gz"))
        nifti.write(seg, str(d / f"{s}_seg.nii.gz"))

    split_file = str(tmp / "split.json")
    split_lib.save_split(split_file, SUBJECTS[:1], SUBJECTS[1:2],
                         SUBJECTS[2:])
    builder = load_module(os.path.join(REPO_ROOT, "scripts",
                                       "create_brats18_dataset.py"),
                          "dvs_builder")
    train_h5 = str(tmp / "train.h5")
    test_h5 = str(tmp / "test.h5")
    builder.build_brats_dataset(str(gt_dir), train_h5, split_file, True)
    builder.build_brats_dataset(str(gt_dir), test_h5, split_file, False)

    unet = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                     "nb_classes": 2, "start_filters": 4}}
    baseline = strategies.train_default(
        _train_cfg(tmp, train_h5, split_file, "dvs_base", unet))
    member2 = strategies.train_default(
        _train_cfg(tmp, train_h5, split_file, "dvs_m2", unet))

    return dict(tmp=tmp, gt_dir=str(gt_dir), split_file=split_file,
                train_h5=train_h5, test_h5=test_h5, unet=unet,
                baseline=baseline, member2=member2, gts=gts, rng_seed=7)


class TestDirectVsStaged:
    def test_deterministic(self, chain, tmp_path):
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        chain["baseline"].model_files.model_dir, "dvs_det")
        loop = strategies.test_default(cfg)
        eval_dir = run_staged_eval(loop.run_dir, "baseline", "probabilities",
                                   str(tmp_path / "staged"), chain["gt_dir"],
                                   chain["split_file"])
        direct_dir = str(tmp_path / "direct")
        eces = evaluate_direct(cfg, direct_dir, run_id="baseline", mc=0)
        assert set(eces) == set(SUBJECTS[2:])
        assert_family_equal(eval_dir, direct_dir, "baseline", "baseline")

    def test_ensemble(self, chain, tmp_path):
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        chain["baseline"].model_files.model_dir, "dvs_ens",
                        others={"model_dir":
                                [chain["member2"].model_files.model_dir],
                                "test_at": "best"})
        loop = strategies.test_ensemble(cfg)
        eval_dir = run_staged_eval(loop.run_dir, "ensemble", "probabilities",
                                   str(tmp_path / "staged"), chain["gt_dir"],
                                   chain["split_file"])
        direct_dir = str(tmp_path / "direct")
        eces = evaluate_direct(cfg, direct_dir, run_id="ensemble")
        assert set(eces) == set(SUBJECTS[2:])
        assert_family_equal(eval_dir, direct_dir, "ensemble", "ensemble")

    def test_aleatoric(self, chain, tmp_path):
        model = {"unet": {**chain["unet"]["unet"], "sigma_out": True}}
        train = strategies.train_aleatoric(_train_cfg(
            chain["tmp"], chain["train_h5"], chain["split_file"], "dvs_alea",
            model, others={"is_log_sigma": False}))
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        train.model_files.model_dir, "dvs_alea_t",
                        others={"is_log_sigma": False})
        loop = strategies.test_aleatoric(cfg)
        eval_dir = run_staged_eval(loop.run_dir, "aleatoric", "sigma",
                                   str(tmp_path / "staged"), chain["gt_dir"],
                                   chain["split_file"])
        direct_dir = str(tmp_path / "direct")
        eces = evaluate_direct(cfg, direct_dir, run_id="aleatoric")
        assert set(eces) == set(SUBJECTS[2:])
        assert_family_equal(eval_dir, direct_dir, "aleatoric_globalrescale",
                            "aleatoric")

    def test_auxiliary_feat(self, chain, tmp_path):
        postnet = {"postnet": {"in_channels": 4, "nb_classes": 2}}
        train = strategies.train_auxiliary_feat(_train_cfg(
            chain["tmp"], chain["train_h5"], chain["split_file"], "dvs_feat",
            postnet,
            others={"model_dir": chain["baseline"].model_files.model_dir,
                    "test_at": "best"}))
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        train.model_files.model_dir, "dvs_feat_t",
                        others={"model_dir":
                                chain["baseline"].model_files.model_dir,
                                "test_at": "best"})
        loop = strategies.test_auxiliary_feat(cfg)
        eval_dir = run_staged_eval(loop.run_dir, "auxiliary_feat",
                                   "confidence", str(tmp_path / "staged"),
                                   chain["gt_dir"], chain["split_file"])
        direct_dir = str(tmp_path / "direct")
        eces = evaluate_direct(cfg, direct_dir, run_id="auxiliary_feat")
        assert set(eces) == set(SUBJECTS[2:])
        assert_family_equal(eval_dir, direct_dir, "auxiliary_feat_rescale",
                            "auxiliary_feat")

    def test_auxiliary_segm(self, chain, tmp_path):
        # aux-segm store: same images/geometry, labels = [gt, baseline-pred],
        # baseline errs on a sub-block (reference prediction-merge builder)
        wpred = str(chain["tmp"] / "wpred.h5")
        if not os.path.exists(wpred):
            with h5.DatasetWriter(wpred) as w:
                for store in (chain["train_h5"], chain["test_h5"]):
                    src = h5.SubjectDataset(store)
                    for s in src.subjects:
                        images = np.asarray(src.read_volume(s, "images"))
                        gt = np.squeeze(
                            np.asarray(src.read_volume(s, "labels")))
                        gt = (gt > 0.5).astype(np.uint8)
                        baseline = gt.copy()
                        baseline[:, 4:7, 4:7] = 0
                        baseline[:, 12:14, 12:14] = 1
                        labels = np.stack([gt, baseline], axis=-1)
                        w.add_subject(s, {"images": images,
                                          "labels": labels},
                                      props=ImageProperties(size=(W, H, Z)),
                                      files=src.files(s))
        model = {"unet": {"depth": 2, "dropout": 0.2, "in_channels": 5,
                          "nb_classes": 2, "start_filters": 4}}
        train = strategies.train_auxiliary_segm(_train_cfg(
            chain["tmp"], wpred, chain["split_file"], "dvs_segm", model))
        cfg = _test_cfg(chain["tmp"], wpred, chain["split_file"],
                        train.model_files.model_dir, "dvs_segm_t")
        loop = strategies.test_auxiliary_segm(cfg)
        eval_dir = run_staged_eval(loop.run_dir, "auxiliary_segm",
                                   "confidence", str(tmp_path / "staged"),
                                   chain["gt_dir"], chain["split_file"])
        direct_dir = str(tmp_path / "direct")
        eces = evaluate_direct(cfg, direct_dir, run_id="auxiliary_segm")
        assert set(eces) == set(SUBJECTS[2:])
        assert_family_equal(eval_dir, direct_dir, "auxiliary_segm_rescale",
                            "auxiliary_segm")

    def test_eval_tree_layout_feeds_the_analysis_table(self, chain, tmp_path,
                                                       monkeypatch):
        """layout='eval_tree' must make a direct-only run a drop-in input
        for the analysis layer: ResultsData discovery + the paper's main
        ECE/UE/BnF/Dice table read the direct out_dir with no file moves."""
        import numpy as np
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        chain["baseline"].model_files.model_dir, "dvs_tree")
        out_dir = str(tmp_path / "tree")
        evaluate_direct(cfg, out_dir, run_id="baseline", mc=0,
                        layout="eval_tree")
        assert os.path.isdir(os.path.join(out_dir, dirs.CALIB_NAME))
        assert os.path.isdir(os.path.join(out_dir, dirs.ECE_FOREGROUND_NAME))

        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR", out_dir)
        from rcu_tpu.analysis import resultdata as resdata
        data = resdata.BratsResultData()
        assert "baseline" in data.get_ids()
        files, ids, cats, ths = data.get_files(["baseline"],
                                               [dirs.UNCERTAINTY_NAME])
        assert len(files) == 11

        import sys
        bin_dir = os.path.join(REPO_ROOT, "bin")
        if bin_dir not in sys.path:
            sys.path.insert(0, bin_dir)
        table = load_module(os.path.join(bin_dir, "table_ece_ue_bnf_dice.py"),
                            "dvs_table")
        monkeypatch.setitem(resdata.brats_selection_id_name_dict,
                            "baseline", "baseline")
        df = table.gather_information("brats")
        assert "baseline" in df.index
        row = df.loc["baseline"]
        assert np.isfinite(row["ece"]) and np.isfinite(row["error"])

    def test_ensemble_mesh_modes_match(self, chain, tmp_path):
        """Ensemble direct on a 1-D data mesh, a 2-D model x data (EP) mesh
        and in throughput mode must all equal the single-device CSVs
        (deterministic forward -> exact comparison)."""
        from rcu_tpu.parallel import ensemble as ens_lib
        from rcu_tpu.parallel import mesh as mesh_lib
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        chain["baseline"].model_files.model_dir, "dvs_ensm",
                        others={"model_dir":
                                [chain["member2"].model_files.model_dir],
                                "test_at": "best"})
        single = str(tmp_path / "single")
        evaluate_direct(cfg, single, run_id="ensemble")
        modes = {
            "data1d": dict(mesh=mesh_lib.make_mesh(n_devices=2)),
            "ep2d": dict(mesh=ens_lib.make_ensemble_mesh(2)),
            "throughput": dict(mesh=mesh_lib.make_mesh(n_devices=2),
                               subject_parallel=True),
        }
        for mode, kw in modes.items():
            out = str(tmp_path / mode)
            evaluate_direct(cfg, out, run_id="ensemble", **kw)
            for name in sorted(os.listdir(single)):
                assert_csv_equal(os.path.join(single, name),
                                 os.path.join(out, name))

    def test_aux_mesh_modes_match(self, chain, tmp_path):
        """Auxiliary-feat direct under latency and throughput mesh modes
        equals single-device."""
        from rcu_tpu.parallel import mesh as mesh_lib
        postnet = {"postnet": {"in_channels": 4, "nb_classes": 2}}
        train = strategies.train_auxiliary_feat(_train_cfg(
            chain["tmp"], chain["train_h5"], chain["split_file"], "dvs_fm",
            postnet,
            others={"model_dir": chain["baseline"].model_files.model_dir,
                    "test_at": "best"}))
        cfg = _test_cfg(chain["tmp"], chain["test_h5"], chain["split_file"],
                        train.model_files.model_dir, "dvs_fm_t",
                        others={"model_dir":
                                chain["baseline"].model_files.model_dir,
                                "test_at": "best"})
        single = str(tmp_path / "single")
        evaluate_direct(cfg, single, run_id="auxiliary_feat")
        for mode, kw in {
            "latency": dict(mesh=mesh_lib.make_mesh(n_devices=2)),
            "throughput": dict(mesh=mesh_lib.make_mesh(n_devices=2),
                               subject_parallel=True),
        }.items():
            out = str(tmp_path / mode)
            evaluate_direct(cfg, out, run_id="auxiliary_feat", **kw)
            for name in sorted(os.listdir(single)):
                assert_csv_equal(os.path.join(single, name),
                                 os.path.join(out, name))
