"""End-to-end offline-eval engine tests with CSV schema + numeric oracles."""
import csv
import os

import numpy as np
import pytest

from rcu_tpu.data import nifti
from rcu_tpu.data.split import save_split
from rcu_tpu.eval import actions as act_lib
from rcu_tpu.eval import analysis, evaldata
from tests.test_ops_calibration import oracle_ece

RNG = np.random.RandomState(17)
SUBJECTS = ["Brats18_A_1", "Brats18_B_2"]
SHAPE = (4, 8, 8)


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval")
    gt_dir = tmp / "Training"
    pred_dir = tmp / "predictions" / "run1"
    pred_dir.mkdir(parents=True)
    data = {}
    for i, subject in enumerate(SUBJECTS):
        sdir = gt_dir / ("HGG" if i == 0 else "LGG") / subject
        sdir.mkdir(parents=True)
        seg = (RNG.rand(*SHAPE) < 0.3).astype(np.uint8) * 2  # labels in {0,2}
        for entry in ("flair", "t1", "t1ce", "t2"):
            img = RNG.rand(*SHAPE).astype(np.float32) + 0.1  # all > 0
            nifti.write(img, str(sdir / f"{subject}_{entry}.nii.gz"))
            if entry == "t2":
                t2 = img
        nifti.write(seg, str(sdir / f"{subject}_seg.nii.gz"))
        probs = RNG.rand(*SHAPE).astype(np.float32)
        pred = (probs > 0.5).astype(np.uint8)
        nifti.write(probs, str(pred_dir / f"{subject}_probabilities.nii.gz"))
        nifti.write(pred, str(pred_dir / f"{subject}_prediction.nii.gz"))
        data[subject] = {"gt": (seg > 0).astype(np.uint8), "probs": probs,
                         "pred": pred, "t2mask": t2 > 0}
    split_file = str(tmp / "split.json")
    save_split(split_file, [], [], SUBJECTS)
    return tmp, str(gt_dir), str(pred_dir), split_file, data


def read_csv(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    return header, body


class TestEvalPipeline:
    def _run(self, eval_env, action_names, base_dir):
        tmp, gt_dir, pred_dir, split_file, data = eval_env
        entry = evaldata.EvalData("baseline", pred_dir)
        entry = evaldata.get_brats_data(entry, in_dir=gt_dir,
                                        split_file=split_file)
        min_max_dir = os.path.join(base_dir, "minmax")
        actions = act_lib.get_actions(action_names, min_max_dir, base_dir,
                                      "foreground")
        for a in actions:
            a.setup_eval(entry)
        for a in actions:
            a.start_eval()
        for sf in entry.subject_files:
            loader = analysis.Loader()
            for a in actions:
                a.eval_subject(sf, loader)
        for a in actions:
            a.finish_eval()
        return entry

    def test_full_pipeline_csv_contracts(self, eval_env, tmp_path):
        base_dir = str(tmp_path / "eval_out")
        self._run(eval_env, ["minmax", "ece_dice", "calib", "bnf_ue"], base_dir)

        # minmax CSV
        header, body = read_csv(os.path.join(
            base_dir, "minmax", "eval_summary_minmax_baseline.csv"))
        assert header == ["confidence_entry", "min", "max"]
        assert body[0][0] == "probabilities"

        # ece CSV (foreground dir for brats)
        header, body = read_csv(os.path.join(
            base_dir, "ece_foreground", "eval_ece_baseline.csv"))
        assert header == ["test_id", "subject_name", "ece", "dice", "tp", "tn",
                          "fp", "fn", "n"]
        assert len(body) == 2 and body[0][1] == SUBJECTS[0]

        # calibration CSV: unfolded 10-bin columns
        header, body = read_csv(os.path.join(
            base_dir, "calibration", "eval_calibration_baseline.csv"))
        assert "bins_count_00" in header and "bins_count_09" in header
        assert "bins_avg_confidence_05" in header
        assert "bins_non_zero_00" in header
        assert header[-2:] == ["ece", "dice"]

        # uncertainty CSVs: 11 thresholds, full correction schema
        unc_dir = os.path.join(base_dir, "uncertainty")
        files = sorted(os.listdir(unc_dir))
        assert len(files) == 11
        assert "eval_uncertainty_baseline_th005.csv" in files
        assert "eval_uncertainty_baseline_th095.csv" in files
        header, body = read_csv(os.path.join(unc_dir, files[0]))
        assert header[:2] == ["test_id", "subject_name"]
        assert list(header[2:]) == list(act_lib.CORRECTION_KEYS)
        assert len(body) == 2

    def test_ece_matches_numpy_oracle(self, eval_env, tmp_path):
        tmp, gt_dir, pred_dir, split_file, data = eval_env
        base_dir = str(tmp_path / "eval_out2")
        self._run(eval_env, ["ece_dice"], base_dir)
        header, body = read_csv(os.path.join(
            base_dir, "ece_foreground", "eval_ece_baseline.csv"))
        col = header.index("ece")
        for row in body:
            subject = row[1]
            d = data[subject]
            probs2 = np.stack([1 - d["probs"], d["probs"]], -1)
            expected = oracle_ece(probs2, d["gt"].astype(np.float64),
                                  mask=d["t2mask"])
            np.testing.assert_allclose(float(row[col]), expected,
                                       rtol=1e-4, atol=1e-6)

    def test_correction_counts_match_oracle(self, eval_env, tmp_path):
        from tests.test_ops_uncertainty import oracle_correction
        tmp, gt_dir, pred_dir, split_file, data = eval_env
        base_dir = str(tmp_path / "eval_out3")
        self._run(eval_env, ["bnf_ue"], base_dir)
        path = os.path.join(base_dir, "uncertainty",
                            "eval_uncertainty_baseline_th050.csv")
        header, body = read_csv(path)
        for row in body:
            subject = row[1]
            d = data[subject]
            # uncertainty preparation for 'probabilities': add background + entropy
            probs2 = np.stack([1 - d["probs"], d["probs"]], -1)
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = -np.where(probs2 > 0, probs2 * np.log(probs2), 0.0).sum(-1)
            u = ent / np.log(2)
            expected = oracle_correction(d["pred"].astype(bool),
                                         d["gt"].astype(bool), u, 0.5)
            for key in ("tpu", "fpu", "tp", "fn"):
                assert int(row[header.index(key)]) == int(expected[key]), key
            np.testing.assert_allclose(
                float(row[header.index("corrected_dice")]),
                expected["corrected_dice"], rtol=1e-5)
            assert row[header.index("dice_benefit")] == str(expected["dice_benefit"])

    def test_actions_reusable_across_runs(self, eval_env, tmp_path):
        """The runner reuses ONE action list over every EvalData entry; a
        pass's history must reset per run or run N's summary (e.g. the
        minmax bounds) aggregates every earlier run's subjects."""
        tmp, gt_dir, pred_dir, split_file, data = eval_env
        # second run whose probabilities live in [0, 0.5]
        pred2 = tmp_path / "pred2"
        pred2.mkdir()
        for subject in SUBJECTS:
            probs = (RNG.rand(*SHAPE) * 0.5).astype(np.float32)
            nifti.write(probs, str(pred2 / f"{subject}_probabilities.nii.gz"))
            nifti.write((probs > 0.25).astype(np.uint8),
                        str(pred2 / f"{subject}_prediction.nii.gz"))
        base_dir = str(tmp_path / "eval_reuse")
        actions = act_lib.get_actions(["minmax"],
                                      os.path.join(base_dir, "minmax"),
                                      base_dir, "foreground")
        for id_, directory in (("baseline", pred_dir), ("half", str(pred2))):
            entry = evaldata.get_brats_data(evaldata.EvalData(id_, directory),
                                            in_dir=gt_dir,
                                            split_file=split_file)
            for a in actions:
                a.setup_eval(entry)
                a.start_eval()
                for sf in entry.subject_files:
                    a.eval_subject(sf, analysis.Loader())
                a.finish_eval()
        _, body = read_csv(os.path.join(
            base_dir, "minmax", "eval_summary_minmax_half.csv"))
        assert float(body[0][2]) <= 0.5  # run 1's ~1.0 values must not leak

    def test_sigma_entry_with_global_rescale(self, eval_env, tmp_path):
        """sigma confidence entry: minmax first, then global-rescale pipelines
        produce the _globalrescale result-id suffix."""
        tmp, gt_dir, pred_dir, split_file, data = eval_env
        # write sigma artifacts
        for subject in SUBJECTS:
            sigma = (RNG.rand(*SHAPE) * 3).astype(np.float32)
            nifti.write(sigma, os.path.join(pred_dir, f"{subject}_sigma.nii.gz"))
        entry = evaldata.EvalData("aleatoric", pred_dir, "sigma")
        entry = evaldata.get_brats_data(entry, in_dir=gt_dir, split_file=split_file)
        base_dir = str(tmp_path / "eval_sigma")
        min_max_dir = os.path.join(base_dir, "minmax")
        actions = act_lib.get_actions(["minmax", "ece_dice", "bnf_ue"],
                                      min_max_dir, base_dir, "foreground")
        # global rescale reads the minmax CSV at setup time, so each action
        # runs fully before the next is set up (the reference has the same
        # ordering requirement — minmax is a prerequisite pass)
        for a in actions:
            a.setup_eval(entry)
            a.start_eval()
            for sf in entry.subject_files:
                a.eval_subject(sf, analysis.Loader())
            a.finish_eval()
        assert os.path.exists(os.path.join(
            min_max_dir, "eval_summary_minmax_aleatoric.csv"))
        # ece uses rescale_sigma='global' -> id suffix _globalrescale
        assert os.path.exists(os.path.join(
            base_dir, "ece_foreground", "eval_ece_aleatoric_globalrescale.csv"))
        assert os.path.exists(os.path.join(
            base_dir, "uncertainty",
            "eval_uncertainty_aleatoric_globalrescale_th050.csv"))
