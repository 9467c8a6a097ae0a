"""Analysis-layer (L8) parity against the REFERENCE's own bin-analysis code.

Every layer below L8 has a reference-parity gate (kernel-level in
test_reference_parity.py, CSV-artifact-level in test_artifact_parity.py).
This module closes the last one: it runs the reference's
``bin-analysis/table_ece_ue_bnf_dice.py`` aggregation (imported read-only
from /root/reference) and its ``plot_calibration.py`` reliability-bin
aggregation over eval CSV trees written by THIS framework's production CSV
writers, and asserts the rendered table numbers, the dense ranks, and the
over/under-confidence ratios agree with ``bin/table_ece_ue_bnf_dice.py`` /
``bin/plot_calibration.py``. Rank logic (dense ranks, bold-rank-1
best-threshold selection) is exactly the kind of thing that silently
diverges — this pins it against the reference's own code.

Import routing: the reference modules import ``rechun.analysis.resultdata``
and ``rechun.directories`` only for file DISCOVERY and path constants; the
test routes those to this framework's contract-compatible equivalents so
both stacks read the SAME files, while the aggregation under test
(gather_information / get_best_thresholds / prepare_for_print /
miscalibration_percentage / create_pdf_all_run_id) is the reference's own
code, executed unmodified.

pandas era-shims: the reference targets pandas ~1.1 (its requirements era);
this image ships pandas 3.x, which removed three behaviors the reference
relies on. The ``pandas1_era`` fixture reproduces them for the duration of
a test: (1) ``groupby().mean()`` silently dropping non-numeric "nuisance"
columns, (2) ``DataFrame.groupby(..., axis=1)``, and (3) positional
``Series[int]`` access for the rows handed out by the axis-1 apply.
"""
import importlib.util
import os
import re
import sys
import types

import numpy as np
import pytest

from rcu_tpu import directories as dirs
from rcu_tpu.analysis import resultdata as resdata

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN_DIR = os.path.join(REPO_ROOT, "bin")

TABLE_ENTRIES = ["ece", "error", "benefit", "dice"]
TABLE_PRECISION = [3, 3, 2, 3]

# the paper's fixed calibration-plot subjects (reference
# bin-analysis/plot_calibration.py:21) — naming the synthetic subjects after
# them lets the reference main() run end-to-end, per-subject plots included
BRATS_SUBJECTS = ["Brats18_TCIA01_390_1", "Brats18_CBICA_AUN_1",
                  "Brats18_CBICA_ASY_1"]
ISIC_SUBJECTS = ["ISIC_0012388", "ISIC_0012654", "ISIC_0012447"]

# selection id -> (_EvalSinks run_id, rescale suffix): the eight result ids
# the paper tables select (analysis/resultdata.py)
ID_PARTS = {
    "baseline": ("baseline", ""),
    "center": ("center", ""),
    "baseline_mc": ("baseline_mc", ""),
    "center_mc": ("center_mc", ""),
    "ensemble": ("ensemble", ""),
    "auxiliary_feat_rescale": ("auxiliary_feat", "_rescale"),
    "auxiliary_segm_rescale": ("auxiliary_segm", "_rescale"),
    "aleatoric_globalrescale": ("aleatoric", "_globalrescale"),
}


def load_bin(name):
    if BIN_DIR not in sys.path:
        sys.path.insert(0, BIN_DIR)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(BIN_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_module(name):
    """Reference bin-analysis module with rechun routed to our equivalents."""
    from rcu_tpu import directories as our_dirs
    from rcu_tpu.analysis import resultdata as our_resdata
    rechun = types.ModuleType("rechun")
    # keep the stub a real package: other parity tests import the reference's
    # rechun.eval.* from disk, which resolves through this __path__
    rechun.__path__ = [os.path.join(REFERENCE, "rechun")]
    analysis_pkg = types.ModuleType("rechun.analysis")
    rechun.analysis = analysis_pkg
    rechun.directories = our_dirs
    analysis_pkg.resultdata = our_resdata
    sys.modules["rechun"] = rechun
    sys.modules["rechun.analysis"] = analysis_pkg
    sys.modules["rechun.analysis.resultdata"] = our_resdata
    sys.modules["rechun.directories"] = our_dirs
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)  # common.utils.filehelper (pure os/shutil)
    import matplotlib
    matplotlib.use("Agg")
    path = os.path.join(REFERENCE, "bin-analysis", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def pandas1_era(monkeypatch):
    """Reproduce the pandas-1.x behaviors the reference's table code relies
    on (see module docstring); removed in pandas 2/3."""
    import pandas as pd
    from pandas.core.groupby.generic import DataFrameGroupBy

    orig_mean = DataFrameGroupBy.mean

    def mean_1x(self, *args, **kwargs):
        try:
            return orig_mean(self, *args, **kwargs)
        except TypeError:  # pandas<2 dropped non-numeric "nuisance" columns
            return orig_mean(self, numeric_only=True)

    monkeypatch.setattr(DataFrameGroupBy, "mean", mean_1x)

    orig_groupby = pd.DataFrame.groupby

    class _Axis1Groupby:
        """pandas<2 DataFrame.groupby(keys, axis=1): sorted column groups;
        only .apply is used by the reference code."""

        def __init__(self, df, keys):
            self.df = df
            self.keys = np.asarray(keys)

        def apply(self, fn):
            out = {}
            for key in sorted(set(self.keys.tolist())):
                sub = self.df.loc[:, self.keys == key]
                # pandas<3 Series[int] fell back to positional access; give
                # the group positional column labels so the reference's
                # y[0]/y[1] row indexing resolves
                sub = sub.set_axis(range(sub.shape[1]), axis=1)
                out[key] = fn(sub)
            return pd.DataFrame(out)

    def groupby_1x(self, by=None, *args, axis=None, **kwargs):
        if axis in (1, "columns"):
            return _Axis1Groupby(self, by)
        return orig_groupby(self, by, *args, **kwargs)

    monkeypatch.setattr(pd.DataFrame, "groupby", groupby_1x)


# ---------------------------------------------------------------------------
# synthetic eval tree, written through the PRODUCTION CSV writers
# ---------------------------------------------------------------------------

def _make_row(rng, k: int, j: int) -> dict:
    """One subject's eval-row payload for strategy index ``k``, subject ``j``.

    Values are synthetic but internally CONSISTENT: ece is recomputed from
    the bins with the reference's own masked formula
    (plot_calibration.py:138-139), because the reference's
    create_pdf_all_run_id asserts exactly that consistency on read-back.
    Strategy k=2 and k=3 share an identical dice so the rounded means TIE —
    the fixture that actually distinguishes dense ranks from 'min' ranks.
    """
    counts = rng.randint(50, 500, 10).astype(np.int64)
    counts[(k + j) % 10] = 0
    counts[(k + 5) % 10] = 0
    non_zero = counts > 0
    conf = np.clip(np.linspace(0.05, 0.95, 10)
                   + rng.uniform(-0.02, 0.02, 10), 0.0, 1.0)
    # signed miscalibration varying by strategy AND subject: the subject
    # spread (+-0.10) straddles the 90th-percentile threshold so the
    # over/under/well ratios come out non-degenerate
    frac = np.clip(conf + (0.08 - 0.02 * k) + 0.10 * (j - 1)
                   + rng.uniform(-0.05, 0.05, 10), 0.0, 1.0)
    proportions = np.where(non_zero, counts / max(counts.sum(), 1), 0.0)
    ece = float((np.abs(conf - frac) * proportions)[non_zero].sum())
    dice = 0.7 if k in (2, 3) else float(0.5 + 0.05 * k + 0.01 * j)

    t = np.arange(11)
    corrected_dice = dice + 0.1 * np.sin((t - k) / 3.0) \
        + 0.004 * rng.standard_normal(11)
    corr = {
        "tpu": rng.randint(5, 80, 11), "tnu": rng.randint(5, 80, 11),
        "fpu": rng.randint(0, 40 + 5 * k, 11),
        "fnu": rng.randint(0, 40 + 3 * k, 11),
        "tp": rng.randint(100, 400, 11), "tn": rng.randint(100, 400, 11),
        "fp": rng.randint(10, 100, 11), "fn": rng.randint(10, 100, 11),
        "dice": np.full(11, dice),
        "accuracy": np.full(11, 0.8),
        "corrected_dice": corrected_dice,
        "corrected_accuracy": corrected_dice * 0.9,
        "dice_benefit": corrected_dice > dice,
        "accuracy_benefit": corrected_dice > dice,
        "dice_benefit_correct": corrected_dice > dice,
        "accuracy_benefit_correct": corrected_dice > dice,
        "corrected_add_dice": corrected_dice + 0.01,
        "corrected_add_accuracy": corrected_dice + 0.01,
    }
    tp, tn = int(rng.randint(200, 500)), int(rng.randint(200, 500))
    fp, fn = int(rng.randint(10, 80)), int(rng.randint(10, 80))
    return {
        "bins_count": counts, "bins_avg_confidence": conf,
        "bins_positive_fraction": frac, "bins_non_zero": non_zero,
        "ece": ece, "dice": dice,
        "tp": tp, "tn": tn, "fp": fp, "fn": fn, "n": tp + tn + fp + fn,
        "correction": corr,
    }


def build_eval_tree(base_dir: str, masked: bool, subjects, seed: int = 7):
    """Full eval-tree CSV set for all 8 paper result ids, written through
    the direct runner's production sinks (eval/direct.py _EvalSinks)."""
    from rcu_tpu.eval.direct import DEFAULT_THRESHOLDS, _EvalSinks
    rng = np.random.RandomState(seed)
    for k, (run_id, suffix) in enumerate(ID_PARTS.values()):
        sinks = _EvalSinks(base_dir, run_id, suffix, DEFAULT_THRESHOLDS,
                           "probabilities", layout="eval_tree", masked=masked)
        for j, subject in enumerate(subjects):
            row = _make_row(rng, k, j)
            sinks.write_subject(subject, lambda key, row=row: row[key])
        sinks.finish()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestMainTableParity:
    @pytest.mark.parametrize("task", ["brats", "isic"])
    def test_numbers_and_dense_ranks_match(self, task, tmp_path, monkeypatch,
                                           pandas1_era):
        subjects = BRATS_SUBJECTS if task == "brats" else ISIC_SUBJECTS
        tree = str(tmp_path / task)
        build_eval_tree(tree, masked=(task == "brats"), subjects=subjects)
        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR" if task == "brats"
                            else "ISIC_EVAL_DIR", tree)

        ref_mod = load_reference_module("table_ece_ue_bnf_dice")
        ref_raw = ref_mod.gather_information(task)
        ref_table = ref_mod.prepare_for_print(ref_raw.copy(), TABLE_ENTRIES,
                                              TABLE_PRECISION)
        our_mod = load_bin("table_ece_ue_bnf_dice")
        our_raw = our_mod.gather_information(task)
        our_table = our_mod.prepare_for_print(our_raw)

        # aggregated numbers (best-threshold selection + subject means) match
        # the reference's own aggregation exactly
        assert list(ref_raw.index) == list(our_raw.index)
        for col in TABLE_ENTRIES:
            np.testing.assert_allclose(
                ref_raw[col].to_numpy(dtype=float),
                our_raw[col].to_numpy(dtype=float), rtol=1e-12, atol=0,
                err_msg=f"{task} column {col}")

        # rendered "value (dense-rank)" cells match, column by column
        assert list(ref_table.index) == list(our_table.index)
        for col in TABLE_ENTRIES:
            assert list(ref_table[col]) == list(our_table[col]), \
                (task, col, list(ref_table[col]), list(our_table[col]))

        # the deliberate k=2/k=3 dice tie really exercises DENSE ranking:
        # two rows share a rank and the next dense rank is +1, not +2
        dice_ranks = [int(re.search(r"\((\d+)\)", c).group(1))
                      for c in ref_table["dice"]]
        assert len(set(dice_ranks)) == len(dice_ranks) - 1  # exactly one tie
        assert sorted(set(dice_ranks)) == list(range(1, len(set(dice_ranks)) + 1))


class TestPrecisionRecallParity:
    @pytest.mark.parametrize("task", ["brats", "isic"])
    def test_curve_data_matches(self, task, tmp_path, monkeypatch):
        """Run the reference's plot_supplmat_error_prec_recall aggregation
        (gather_base threshold parsing + its own rechun.eval.helper
        pandas_error_precision/recall + the per-threshold groupby means,
        reference :36-81) over OUR uncertainty CSVs and compare the rendered
        curve xy-data line by line against bin/
        plot_supplmat_error_prec_recall.py."""
        subjects = BRATS_SUBJECTS if task == "brats" else ISIC_SUBJECTS
        tree = str(tmp_path / task)
        build_eval_tree(tree, masked=(task == "brats"), subjects=subjects)
        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR" if task == "brats"
                            else "ISIC_EVAL_DIR", tree)

        import matplotlib.pyplot as plt
        ref_mod = load_reference_module("plot_supplmat_error_prec_recall")
        getter = (ref_mod.get_brats_data if task == "brats"
                  else ref_mod.get_isic_data)
        data, ids_names = getter()
        assert data, "reference discovery found no uncertainty CSVs"
        ref_df = ref_mod.gather_base(data)
        plt.close("all")
        ref_mod.plot_precision_recall(ref_df, ids_names,
                                      str(tmp_path / "ref.svg"))
        ref_lines = {ln.get_label(): np.asarray(ln.get_xydata())
                     for fig_num in plt.get_fignums()
                     for ax in plt.figure(fig_num).axes
                     for ln in ax.lines}
        plt.close("all")

        our_mod = load_bin("plot_supplmat_error_prec_recall")
        our_df, our_ids_names = our_mod.load_df(task)
        monkeypatch.setattr(our_mod.plt, "close", lambda *a, **k: None)
        our_mod.plot_precision_recall(our_df, our_ids_names,
                                      str(tmp_path / "ours.svg"))
        our_lines = {ln.get_label(): np.asarray(ln.get_xydata())
                     for fig_num in plt.get_fignums()
                     for ax in plt.figure(fig_num).axes
                     for ln in ax.lines}
        plt.close("all")

        assert set(ids_names.values()) <= set(ref_lines)
        assert set(ref_lines) == set(our_lines)
        for name in ids_names.values():
            assert ref_lines[name].shape == our_lines[name].shape \
                and ref_lines[name].shape[0] == 11, name  # 11 thresholds
            np.testing.assert_allclose(ref_lines[name], our_lines[name],
                                       rtol=1e-12, atol=0, err_msg=name)
        # the synthetic fpu/fnu grow with the strategy index, so the curves
        # genuinely differ between strategies — not a vacuous equality
        stack = np.stack([ref_lines[n] for n in ids_names.values()])
        assert float(np.ptp(stack[:, :, 1])) > 0.01


class TestDatasetVsMeanSubjectParity:
    @pytest.mark.parametrize("task", ["brats", "isic"])
    def test_pooled_and_mean_ece_match(self, task, tmp_path, monkeypatch):
        """Run the reference's table_supplmat_ece_dataset_vs_meansubject
        aggregation (masked-bin pooled dataset-ECE vs mean-subject ECE,
        incl. its internal CSV-vs-bins allclose assert, reference :59-86)
        over OUR calibration CSVs and compare against
        bin/table_supplmat_ece_dataset_vs_meansubject.py."""
        subjects = BRATS_SUBJECTS if task == "brats" else ISIC_SUBJECTS
        tree = str(tmp_path / task)
        build_eval_tree(tree, masked=(task == "brats"), subjects=subjects)
        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR" if task == "brats"
                            else "ISIC_EVAL_DIR", tree)

        ref_mod = load_reference_module(
            "table_supplmat_ece_dataset_vs_meansubject")
        ref_df = ref_mod.gather_information(task)

        our_mod = load_bin("table_supplmat_ece_dataset_vs_meansubject")
        our_df = our_mod.gather(task)

        assert list(ref_df.index) == list(our_df.index)
        for col in ("ece", "ds_ece"):
            np.testing.assert_allclose(
                ref_df[col].to_numpy(dtype=float),
                our_df[col].to_numpy(dtype=float), rtol=1e-12, atol=0,
                err_msg=f"{task} {col}")
        # pooled vs mean-subject genuinely differ on the synthetic bins —
        # the comparison distinguishes the two aggregations
        assert float(np.max(np.abs(ref_df["ece"].to_numpy(dtype=float)
                                   - ref_df["ds_ece"].to_numpy(dtype=float)))) \
            > 1e-4

        # the reference's rendered LaTeX (percent + rounding) matches ours
        ref_print = ref_mod.prepare_for_print(ref_df.copy(),
                                              {"ece": 3, "ds_ece": 3})
        our_print = (our_df * 100).round(3)
        np.testing.assert_allclose(ref_print["ece"].to_numpy(dtype=float),
                                   our_print["ece"].to_numpy(dtype=float),
                                   rtol=0, atol=0)


class TestSaveImagesParity:
    @pytest.fixture
    def ref_mod(self, monkeypatch):
        """Reference save_images with its rechun.eval imports stubbed out
        (it binds rechun.eval.evaldata/analysis at import time but the
        logic under test — get_slice_and_str + OutWriterPng — never touches
        them); monkeypatch.setitem restores sys.modules afterwards so other
        parity tests still import the real reference rechun.eval modules."""
        eval_pkg = types.ModuleType("rechun.eval")
        eval_pkg.__path__ = [os.path.join(REFERENCE, "rechun", "eval")]
        monkeypatch.setitem(sys.modules, "rechun.eval", eval_pkg)
        monkeypatch.setitem(sys.modules, "rechun.eval.evaldata",
                            types.ModuleType("rechun.eval.evaldata"))
        monkeypatch.setitem(sys.modules, "rechun.eval.analysis",
                            types.ModuleType("rechun.eval.analysis"))
        return load_reference_module("save_images")

    @staticmethod
    def _subject_data(task: str, seed: int = 0):
        """Synthetic prepared-subject dict: an off-center non-zero image
        blob (margins fit), GT/prediction masks, [0,1] uncertainty."""
        rng = np.random.RandomState(seed)
        if task == "brats":
            z, h, w = 5, 72, 64
            img = np.zeros((z, h, w), np.float32)
            # non-square blob so squared='max' genuinely pads an axis
            img[:, 18:42, 20:48] = rng.rand(z, 24, 28) + 0.5
            gt = np.zeros((z, h, w), np.uint8)
            gt[2:5, 24:40, 24:40] = 1
            gt[3, 22:42, 22:42] = 1  # slice 3 has the largest GT area
            unc = rng.rand(z, h, w).astype(np.float32)
            pred = (rng.rand(z, h, w) > 0.6).astype(np.uint8)
            return {"flair": img, "target": gt, "prediction": pred,
                    "uncertainty": unc}
        h, w = 48, 64
        img = np.zeros((h, w, 3), np.float32)
        img[10:38, 12:50] = rng.rand(28, 38, 3) + 0.25
        gt = np.zeros((h, w), np.uint8)
        gt[14:30, 20:44] = 1
        unc = rng.rand(h, w).astype(np.float32)
        pred = (rng.rand(h, w) > 0.6).astype(np.uint8)
        return {"image": img, "target": gt, "prediction": pred,
                "uncertainty": unc}

    def test_slice_selection_matches(self, ref_mod):
        our_mod = load_bin("save_images")
        for task in ("brats", "isic"):
            d = self._subject_data(task)
            ref_sel = ref_mod.get_slice_and_str(d, task)
            our_sel = our_mod.select_slice(d, task)
            if task == "isic":
                assert ref_sel == slice(None) and our_sel == slice(None)
            else:
                assert int(ref_sel) == int(our_sel) == 3

    @pytest.mark.parametrize("task,key,squared,dims", [
        ("brats", "flair", "max", None), ("isic", "image", "min", 2)])
    def test_bbox_matches(self, ref_mod, tmp_path, task, key, squared, dims):
        """The crop bounds — asymmetric 10-margin, axis order, pad-to-max /
        shrink-to-min squaring — equal the reference's _get_bbox exactly,
        across blob geometries."""
        our_mod = load_bin("save_images")
        writer = ref_mod.OutWriterPng(str(tmp_path), task, key)
        for seed in range(4):
            d = self._subject_data(task, seed=seed)
            sel = ref_mod.get_slice_and_str(d, task)
            img = d[key][sel]
            ref_bbox = writer._get_bbox(
                img, squared=squared, **({} if dims is None
                                         else {"dims": dims}))
            our_bbox = our_mod.get_bbox(img, squared=squared, dims=dims)
            assert [tuple(b) for b in ref_bbox] \
                == [tuple(b) for b in our_bbox], (task, seed)
            # squared really engages: the raw extents differ per axis
            h_ext = ref_bbox[0][1] - ref_bbox[0][0]
            w_ext = ref_bbox[1][1] - ref_bbox[1][0]
            assert h_ext == w_ext, "squared bbox must be square"

    @pytest.mark.parametrize("task,key", [("brats", "flair"),
                                          ("isic", "image")])
    def test_png_file_sets_match(self, ref_mod, tmp_path, task, key):
        """Drive the reference's OutWriterPng and our write_subject_images
        over the SAME prepared subject: the produced PNG filename sets
        (incl. the _sl suffix quirk: image/GT only) must be identical."""
        import matplotlib.pyplot as plt
        d = self._subject_data(task)
        ref_dir = tmp_path / "ref"
        ref_dir.mkdir()
        writer = ref_mod.OutWriterPng(str(ref_dir), task, key)
        writer.on_new_subject("subj", d)
        writer.on_test_id("baseline", d)
        plt.close("all")

        our_mod = load_bin("save_images")
        our_dir = tmp_path / "ours" / "subj"
        our_dir.mkdir(parents=True)
        our_mod.write_subject_images(str(our_dir), "baseline", key, d, task)

        ref_files = sorted(os.listdir(ref_dir / "subj"))
        our_files = sorted(os.listdir(our_dir))
        assert ref_files == our_files, (task, ref_files, our_files)
        expected_sl = "" if task == "isic" else "_sl3"
        assert f"{key}{expected_sl}.png" in ref_files
        assert f"{key}_gt_overlay{expected_sl}.png" in ref_files
        assert f"baseline_{key}_pred_overlay.png" in ref_files
        assert "baseline_uncert.png" in ref_files


class TestReliabilityAggregationParity:
    def test_plot_calibration_main_and_ratios_match(self, tmp_path,
                                                    monkeypatch, capsys):
        """Run the reference's plot_calibration MAIN end-to-end over our
        CSVs (its create_pdf_all_run_id internally asserts the CSV ece
        column against its own bins formula), then compare the printed
        over/under/well-calibrated ratios against our implementation."""
        tree = str(tmp_path / "brats")
        build_eval_tree(tree, masked=True, subjects=BRATS_SUBJECTS)
        monkeypatch.setattr(dirs, "BRATS_EVAL_DIR", tree)
        monkeypatch.setattr(dirs, "BRATS_PLOT_DIR", str(tmp_path / "plots"))

        ref_mod = load_reference_module("plot_calibration")
        # create_legend_only is legend-rendering cosmetics whose list-label
        # multi-plot call modern matplotlib rejects (era incompatibility) —
        # no aggregation lives there; everything else in main() runs as-is
        monkeypatch.setattr(ref_mod, "create_legend_only",
                            lambda *a, **k: None)
        ref_mod.main("brats")
        ref_out = capsys.readouterr().out
        m = re.search(r"\[brats\] overall_err:([-\d.e]+)\s+overconfident: "
                      r"([\d.]+)\s+underconfident: ([\d.]+)\s+"
                      r"well-calibrated: ([\d.]+)", ref_out)
        assert m, ref_out
        ref_thr, ref_over, ref_under, ref_well = (float(g) for g in m.groups())

        # the reference main rendered the full figure set from our CSVs
        plot_dir = tmp_path / "plots" / dirs.CALIB_NAME
        assert (plot_dir / "summary_all_brats.svg").exists()
        for s in BRATS_SUBJECTS:
            assert (plot_dir / f"subject_{s}.svg").exists()

        our_mod = load_bin("plot_calibration")
        df, ids_names = our_mod.load_calibration_df("brats")
        over, under, well = our_mod.miscalibration_percentage(df, ids_names,
                                                              "brats")
        our_out = capsys.readouterr().out
        m2 = re.search(r"overall_err:([-\d.e]+)", our_out)
        assert m2, our_out
        assert round(float(m2.group(1)), 3) == ref_thr
        assert round(over, 2) == ref_over
        assert round(under, 2) == ref_under
        assert round(well, 2) == ref_well
        # the synthetic per-strategy miscalibration spread makes the ratios
        # non-degenerate — the comparison is not vacuously 0/0/1
        assert 0.0 < well < 1.0 or (ref_over > 0 and ref_under > 0)
