"""THE integration test: raw BraTS-layout tree -> split maker -> H5 builder ->
training -> MC test artifacts -> eval engine over those artifacts -> CSV
discovery -> main analysis table. Everything through the same code paths a
user runs, on synthetic data."""
import importlib.util
import os
import sys

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data import h5, nifti
from rcu_tpu.data import split as split_lib
from rcu_tpu.eval import actions as act_lib
from rcu_tpu.eval import analysis, evaldata

pytestmark = pytest.mark.slow

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SUBJECTS = [f"Brats18_INT_{i:02d}_1" for i in range(5)]
Z, H, W = 4, 24, 24


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chain")
    rng = np.random.RandomState(12)

    # 1. raw GT tree (Brats17 layout)
    gt_dir = tmp / "Training"
    for i, s in enumerate(SUBJECTS):
        d = gt_dir / ("HGG" if i < 3 else "LGG") / s
        d.mkdir(parents=True)
        seg = np.zeros((Z, H, W), np.uint8)
        seg[:, 6:18, 6:18] = 4  # labels 0..4 -> binarized by the builder
        for e in ("flair", "t1", "t1ce", "t2"):
            img = rng.rand(Z, H, W).astype(np.float32) + 0.2
            if e == "flair":
                img += 2.0 * (seg > 0)
            nifti.write(img, str(d / f"{s}_{e}.nii.gz"))
        nifti.write(seg, str(d / f"{s}_seg.nii.gz"))

    # 2. split + H5 stores via the actual builder script
    split_file = str(tmp / "split.json")
    split_lib.save_split(split_file, SUBJECTS[:2], SUBJECTS[2:3], SUBJECTS[3:])
    builder = load_module(os.path.join(REPO_ROOT, "scripts",
                                       "create_brats18_dataset.py"), "builder")
    train_h5 = str(tmp / "train.h5")
    test_h5 = str(tmp / "test.h5")
    builder.build_brats_dataset(str(gt_dir), train_h5, split_file, True)
    builder.build_brats_dataset(str(gt_dir), test_h5, split_file, False)

    # 3. train the baseline
    from rcu_tpu.engine import config as cfg_lib
    cfg = cfg_lib.TrainConfiguration(
        epochs=3, seed=20, split=split_file, train_dir=str(tmp / "out"),
        train_name="chain_baseline",
        model=cfg_lib.ParametricNode("unet", dict(
            depth=2, dropout=0.1, in_channels=4, nb_classes=2, start_filters=4)),
        optimizer=cfg_lib.ParametricNode("adam", {"lr": 0.003}),
        train_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 8, "dataset": train_h5, "indexing": {"slice": {}},
             "selection_strategy": {"none-black": {}}, "shuffle": True}),
        valid_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 8, "dataset": train_h5, "indexing": {"slice": {}},
             "shuffle": False}))
    loop = strategies.train_default(cfg)

    # 4. MC test -> NIfTI artifacts
    tcfg = cfg_lib.TestConfiguration(
        seed=20, split=split_file, model_dir=loop.model_files.model_dir,
        test_name="chain_mc", test_dir=str(tmp / "pred"), test_at="best",
        others={"mc": 4},
        test_data=cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 8, "dataset": test_h5, "indexing": {"slice": {}},
             "shuffle": False}))
    tloop = strategies.test_default(tcfg)

    # 5. offline eval over the artifacts the test loop just wrote
    entry = evaldata.EvalData("baseline_mc", tloop.run_dir)
    entry = evaldata.get_brats_data(entry, in_dir=str(gt_dir),
                                    split_file=split_file)
    eval_dir = str(tmp / "eval")
    min_max_dir = os.path.join(eval_dir, "minmax")
    for a in act_lib.get_actions(["minmax", "ece_dice", "calib", "bnf_ue"],
                                 min_max_dir, eval_dir, "foreground"):
        a.setup_eval(entry)
        a.start_eval()
        for sf in entry.subject_files:
            a.eval_subject(sf, analysis.Loader())
        a.finish_eval()

    return tmp, str(gt_dir), split_file, eval_dir, tloop


class TestFullChain:
    def test_artifact_set_matches_test_split(self, chain):
        tmp, gt_dir, split_file, eval_dir, tloop = chain
        _, _, test_subjects = split_lib.load_split(split_file)
        preds = sorted(p for p in os.listdir(tloop.run_dir)
                       if p.endswith("_prediction.nii.gz"))
        assert [p.replace("_prediction.nii.gz", "") for p in preds] \
            == sorted(test_subjects)

    def test_eval_csvs_exist_with_rows_per_subject(self, chain):
        tmp, gt_dir, split_file, eval_dir, tloop = chain
        _, _, test_subjects = split_lib.load_split(split_file)
        ece_csv = os.path.join(eval_dir, "ece_foreground",
                               "eval_ece_baseline_mc.csv")
        with open(ece_csv) as f:
            lines = f.read().strip().splitlines()
        assert len(lines) == 1 + len(test_subjects)
        # trained model should segment the strong blob reasonably: dice column
        header = lines[0].split(",")
        dice_idx = header.index("dice")
        dices = [float(l.split(",")[dice_idx]) for l in lines[1:]]
        assert all(0.0 <= d <= 1.0 for d in dices)

    def test_discovery_and_main_table(self, chain, monkeypatch):
        tmp, gt_dir, split_file, eval_dir, tloop = chain
        from rcu_tpu import directories as dirs
        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR", eval_dir)
        from rcu_tpu.analysis import resultdata as resdata
        data = resdata.BratsResultData()
        assert "baseline_mc" in data.get_ids()
        files, ids, cats, ths = data.get_files(["baseline_mc"],
                                               ["uncertainty"])
        assert len(files) == 11

        bin_dir = os.path.join(REPO_ROOT, "bin")
        if bin_dir not in sys.path:
            sys.path.insert(0, bin_dir)
        table = load_module(os.path.join(bin_dir, "table_ece_ue_bnf_dice.py"),
                            "chain_table")
        monkeypatch.setitem(resdata.brats_selection_id_name_dict,
                            "baseline_mc", "baseline+MC")
        df = table.gather_information("brats")
        assert "baseline+MC" in df.index
        row = df.loc["baseline+MC"]
        assert np.isfinite(row["ece"]) and np.isfinite(row["error"])
