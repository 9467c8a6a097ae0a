"""Analysis-layer tests: CSV discovery, main table, calibration plots,
PR curves, dataset-vs-meansubject table, qualitative images."""
import importlib.util
import os
import sys

import numpy as np
import pytest

from rcu_tpu import directories as dirs
from rcu_tpu.data import nifti
from rcu_tpu.data.split import save_split
from rcu_tpu.eval import actions as act_lib
from rcu_tpu.eval import analysis, evaldata

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN_DIR = os.path.join(REPO_ROOT, "bin")


def load_bin(name):
    if BIN_DIR not in sys.path:
        sys.path.insert(0, BIN_DIR)
    spec = importlib.util.spec_from_file_location(name,
                                                  os.path.join(BIN_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SUBJECTS = ["Brats18_AAA_1", "Brats18_BBB_2", "Brats18_CCC_3"]
SHAPE = (3, 10, 10)


@pytest.fixture(scope="module")
def full_eval_tree(tmp_path_factory):
    """GT tree + two strategy prediction runs -> full eval CSV tree."""
    tmp = tmp_path_factory.mktemp("analysis")
    gt_dir = tmp / "Training"
    rng = np.random.RandomState(4)
    runs = {"baseline": "probabilities", "aleatoric": "sigma"}
    run_dirs = {}
    for name in runs:
        (tmp / "preds" / name).mkdir(parents=True)
        run_dirs[name] = str(tmp / "preds" / name)

    for i, s in enumerate(SUBJECTS):
        d = gt_dir / "HGG" / s
        d.mkdir(parents=True)
        seg = (rng.rand(*SHAPE) < 0.3).astype(np.uint8)
        for e in ("flair", "t1", "t1ce", "t2"):
            nifti.write(rng.rand(*SHAPE).astype(np.float32) + 0.1,
                        str(d / f"{s}_{e}.nii.gz"))
        nifti.write(seg, str(d / f"{s}_seg.nii.gz"))
        for name, entry in runs.items():
            probs = rng.rand(*SHAPE).astype(np.float32)
            nifti.write(probs, str(tmp / "preds" / name / f"{s}_{entry}.nii.gz"))
            nifti.write((probs > 0.5).astype(np.uint8),
                        str(tmp / "preds" / name / f"{s}_prediction.nii.gz"))
    split_file = str(tmp / "split.json")
    save_split(split_file, [], [], SUBJECTS)

    eval_dir = str(tmp / "eval")
    min_max_dir = os.path.join(eval_dir, "minmax")
    for name, entry in runs.items():
        ed = evaldata.EvalData(name, run_dirs[name], entry)
        ed = evaldata.get_brats_data(ed, in_dir=str(gt_dir), split_file=split_file)
        for a in act_lib.get_actions(["minmax", "ece_dice", "calib", "bnf_ue"],
                                     min_max_dir, eval_dir, "foreground"):
            a.setup_eval(ed)
            a.start_eval()
            for sf in ed.subject_files:
                a.eval_subject(sf, analysis.Loader())
            a.finish_eval()
    return tmp, str(gt_dir), run_dirs, split_file, eval_dir


@pytest.fixture()
def patched_dirs(full_eval_tree, monkeypatch):
    tmp, gt_dir, run_dirs, split_file, eval_dir = full_eval_tree
    monkeypatch.setattr(dirs, "BRATS_EVAL_DIR", eval_dir)
    monkeypatch.setattr(dirs, "BRATS_PLOT_DIR", str(tmp / "plots"))
    monkeypatch.setattr(dirs, "BRATS_ORIG_DATA_DIR", gt_dir)
    monkeypatch.setattr(dirs, "BRATS_PREDICT_DIR", str(tmp / "preds"))
    monkeypatch.setattr(dirs, "BRATS_BASELINE_PREDICT", "baseline")
    monkeypatch.setattr(dirs, "BRATS_ALEATORIC_PREDICT", "aleatoric")
    monkeypatch.setattr(dirs, "SPLITS_DIR", os.path.dirname(split_file))
    import shutil
    target = os.path.join(os.path.dirname(split_file),
                          "split_brats18_100-25-160.json")
    if not os.path.exists(target):
        shutil.copy(split_file, target)
    return full_eval_tree


class TestResultData:
    def test_discovery(self, patched_dirs):
        from rcu_tpu.analysis import resultdata as resdata
        data = resdata.BratsResultData()
        ids = data.get_ids()
        assert "baseline" in ids
        assert "aleatoric_globalrescale" in ids  # sigma + global rescale suffix
        files, fids, cats, ths = data.get_files(
            ["baseline"], [dirs.UNCERTAINTY_NAME])
        assert len(files) == 11 and set(ths) == {
            "005", "010", "020", "030", "040", "050", "060", "070", "080",
            "090", "095"}


class TestMainTable:
    def test_gather_and_print(self, patched_dirs, capsys):
        mod = load_bin("table_ece_ue_bnf_dice")
        df = mod.gather_information("brats")
        assert "baseline" in df.index and "aleatoric" in df.index
        assert {"ece", "error", "benefit", "dice"} <= set(df.columns)
        printable = mod.prepare_for_print(df)
        assert printable.loc["baseline", "ece"].endswith(")")  # 'value (rank)'


class TestCalibrationPlots:
    def test_plots_and_miscalibration(self, patched_dirs, monkeypatch):
        mod = load_bin("plot_calibration")
        monkeypatch.setattr(mod, "BRATS_SUBJECTS", SUBJECTS[:1])
        mod.main("brats")
        out_dir = os.path.join(dirs.BRATS_PLOT_DIR, dirs.CALIB_NAME)
        assert os.path.exists(os.path.join(out_dir, "summary_all_brats.svg"))
        assert os.path.exists(os.path.join(out_dir,
                                           f"subject_{SUBJECTS[0]}.svg"))
        assert os.path.exists(os.path.join(out_dir, "legend.svg"))


class TestPrecisionRecall:
    def test_plot(self, patched_dirs):
        mod = load_bin("plot_supplmat_error_prec_recall")
        mod.main("brats")
        assert os.path.exists(os.path.join(
            dirs.BRATS_PLOT_DIR, "suppl_mat", "error_prec_recall_brats.svg"))


class TestDatasetVsMeanSubject:
    def test_table(self, patched_dirs):
        mod = load_bin("table_supplmat_ece_dataset_vs_meansubject")
        df = mod.gather("brats")
        assert "ece" in df.columns and "ds_ece" in df.columns
        baseline = df.loc["baseline"]
        assert np.isfinite(baseline["ece"]) and np.isfinite(baseline["ds_ece"])


class TestSaveImages:
    def test_images_written(self, patched_dirs, monkeypatch):
        mod = load_bin("save_images")
        monkeypatch.setattr(mod, "BRATS_SUBJECTS", SUBJECTS[:1])
        mod.main("brats", ["baseline"])
        subject_dir = os.path.join(dirs.BRATS_PLOT_DIR, "images", SUBJECTS[0])
        files = os.listdir(subject_dir)
        assert any(f.startswith("flair_sl") and f.endswith(".png") for f in files)
        assert any("gt_overlay" in f for f in files)
        assert any("pred_overlay" in f for f in files)
        assert any("uncert" in f for f in files)
