"""ISIC-side offline eval chain: 2D NIfTI artifacts, no foreground mask,
IsicCollector-joined registry, isic result discovery."""
import os

import numpy as np
import pytest
from PIL import Image

from rcu_tpu.data import nifti
from rcu_tpu.eval import actions as act_lib
from rcu_tpu.eval import analysis, evaldata

H, W = 24, 32
SUBJECTS = [f"ISIC_{i:07d}" for i in range(3)]


@pytest.fixture(scope="module")
def isic_eval_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("isic_eval")
    data_dir = tmp / "ISIC-2017_Test_v2_Data"
    gt_dir = tmp / "ISIC-2017_Test_v2_Part1_GroundTruth"
    pred_dir = tmp / "pred_run"
    data_dir.mkdir(), gt_dir.mkdir(), pred_dir.mkdir()
    rng = np.random.RandomState(3)
    for s in SUBJECTS:
        Image.fromarray((rng.rand(H, W, 3) * 255).astype(np.uint8)).save(
            data_dir / f"{s}.jpg")
        mask = ((rng.rand(H, W) > 0.6) * 255).astype(np.uint8)
        Image.fromarray(mask).save(gt_dir / f"{s}_segmentation.png")
        probs = rng.rand(H, W).astype(np.float32)
        nifti.write(probs, str(pred_dir / f"{s}_probabilities.nii.gz"))
        nifti.write((probs > 0.5).astype(np.uint8),
                    str(pred_dir / f"{s}_prediction.nii.gz"))
    return tmp, str(tmp / "ISIC-2017_Test_v2"), str(pred_dir)


class TestIsicEval:
    def test_registry_join_and_actions(self, isic_eval_tree, tmp_path):
        tmp, gt_prefix, pred_dir = isic_eval_tree
        entry = evaldata.EvalData("baseline", pred_dir)
        entry = evaldata.get_isic_data(entry, in_dir=gt_prefix)
        assert len(entry.subject_files) == 3
        sf = entry.subject_files[0]
        assert "prediction" in sf.categories["labels"].entries
        assert "probabilities" in sf.categories["misc"].entries
        assert "gt" in sf.categories["labels"].entries

        base_dir = str(tmp_path / "eval")
        # isic uses ece_details='' -> plain ece dir, no mask
        actions = act_lib.get_actions(["minmax", "ece_dice", "calib", "bnf_ue"],
                                      os.path.join(base_dir, "minmax"),
                                      base_dir, "")
        for a in actions:
            a.setup_eval(entry)
            a.start_eval()
            for sf in entry.subject_files:
                a.eval_subject(sf, analysis.Loader())
            a.finish_eval()
        assert os.path.exists(os.path.join(base_dir, "ece",
                                           "eval_ece_baseline.csv"))
        assert not os.path.exists(os.path.join(base_dir, "ece_foreground"))
        with open(os.path.join(base_dir, "ece", "eval_ece_baseline.csv")) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 4

    def test_isic_result_discovery(self, isic_eval_tree, tmp_path, monkeypatch):
        tmp, gt_prefix, pred_dir = isic_eval_tree
        from rcu_tpu import directories as dirs
        from rcu_tpu.analysis import resultdata as resdata
        entry = evaldata.EvalData("baseline", pred_dir)
        entry = evaldata.get_isic_data(entry, in_dir=gt_prefix)
        base_dir = str(tmp_path / "eval2")
        for a in act_lib.get_actions(["ece_dice", "bnf_ue"],
                                     os.path.join(base_dir, "minmax"),
                                     base_dir, ""):
            a.setup_eval(entry)
            a.start_eval()
            for sf in entry.subject_files:
                a.eval_subject(sf, analysis.Loader())
            a.finish_eval()
        monkeypatch.setattr(dirs, "ISIC_EVAL_DIR", base_dir)
        data = resdata.IsicResultData()
        assert "baseline" in data.get_ids()
        files, ids, cats, ths = data.get_files(["baseline"], ["ece"])
        assert len(files) == 1  # isic uses plain 'ece' category
