"""CSV-artifact parity against the REFERENCE's own eval stack.

Runs the reference's ``bin-eval/eval_uncertainty.py`` (imported read-only from
/root/reference with its pymia/SimpleITK dependencies stubbed) and this
framework's eval actions on IDENTICAL synthetic NIfTI artifacts, then diffs
every produced CSV — headers exactly, numeric cells to the BASELINE.json 1e-3
parity gate (observed agreement is ~1e-5). This is the end-to-end artifact
gate on top of the kernel-level parity tests in test_reference_parity.py.
"""
import csv
import glob
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")

SUBJECTS = ["Brats18_PAR_01_1", "Brats18_PAR_02_1"]
SHAPE = (4, 10, 10)


# ---------------------------------------------------------------------------
# stubs: just enough pymia/SimpleITK for the reference eval import graph
# ---------------------------------------------------------------------------

def _dummy_attr_module(name):
    mod = types.ModuleType(name)

    def module_getattr(attr):  # PEP 562; dunders must miss (inspect probes them)
        if attr.startswith("__"):
            raise AttributeError(attr)
        return type(attr, (), {})

    mod.__getattr__ = module_getattr
    return mod


def _install_stubs():
    from rcu_tpu.data import nifti

    # SimpleITK: ReadImage/GetArrayFromImage backed by the first-party reader
    sitk = types.ModuleType("SimpleITK")
    sitk.sitkUInt8 = "uint8"

    class _Img:
        def __init__(self, arr):
            self.arr = arr

    def read_image(path, pixel_type=None):
        arr, _ = nifti.read(str(path))
        if pixel_type == "uint8":
            arr = arr.astype(np.uint8)
        return _Img(arr)

    sitk.ReadImage = read_image
    sitk.GetArrayFromImage = lambda img: img.arr.copy()
    sys.modules["SimpleITK"] = sitk

    # pymia tree
    pymia = types.ModuleType("pymia")
    data = _dummy_attr_module("pymia.data")
    conversion = types.ModuleType("pymia.data.conversion")

    class SimpleITKNumpyImageBridge:
        @staticmethod
        def convert(img):
            return img.arr.copy(), None

    conversion.SimpleITKNumpyImageBridge = SimpleITKNumpyImageBridge

    metric = types.ModuleType("pymia.evaluation.metric")

    class ConfusionMatrix:
        def __init__(self, prediction, label):
            p = np.asarray(prediction).astype(bool)
            t = np.asarray(label).astype(bool)
            self.tp = int((p & t).sum())
            self.fp = int((p & ~t).sum())
            self.fn = int((~p & t).sum())
            self.tn = int((~p & ~t).sum())
            self.n = int(p.size)

    class DiceCoefficient:
        confusion_matrix = None

        def calculate(self):
            cm = self.confusion_matrix
            return 2 * cm.tp / (2 * cm.tp + cm.fp + cm.fn)

    class Accuracy:
        confusion_matrix = None

        def calculate(self):
            cm = self.confusion_matrix
            return (cm.tp + cm.tn) / cm.n

    metric.ConfusionMatrix = ConfusionMatrix
    metric.DiceCoefficient = DiceCoefficient
    metric.Accuracy = Accuracy

    config_mod = types.ModuleType("pymia.config.configuration")

    class Dictable:
        def to_dict(self, **kw):
            return vars(self)

        def from_dict(self, d, **kw):
            vars(self).update(d)

    class ConfigurationBase(Dictable):
        pass

    config_mod.Dictable = Dictable
    config_mod.ConfigurationBase = ConfigurationBase
    config_mod.load = lambda *a, **k: None
    config_mod.save = lambda *a, **k: None

    modules = {
        "pymia": pymia,
        "pymia.data": data,
        "pymia.data.subjectfile": _dummy_attr_module("pymia.data.subjectfile"),
        "pymia.data.conversion": conversion,
        "pymia.data.extraction": _dummy_attr_module("pymia.data.extraction"),
        "pymia.data.transformation": _dummy_attr_module("pymia.data.transformation"),
        "pymia.data.assembler": _dummy_attr_module("pymia.data.assembler"),
        "pymia.evaluation": _dummy_attr_module("pymia.evaluation"),
        "pymia.evaluation.metric": metric,
        "pymia.config": _dummy_attr_module("pymia.config"),
        "pymia.config.configuration": config_mod,
        "pymia.deeplearning": _dummy_attr_module("pymia.deeplearning"),
    }
    # FORCE-install: another test module (test_reference_parity) may have
    # already registered thinner pymia stubs; ours are a superset and the
    # reference's eval stack needs the richer ones (e.g. DiceCoefficient)
    for name, mod in modules.items():
        sys.modules[name] = mod
    # drop any cached reference modules that captured the older stubs at
    # import time — the next import must re-bind against ours
    for name in [n for n in sys.modules
                 if n == "common" or n.startswith("common.")]:
        del sys.modules[name]
    # `import a.b.c as x` binds via getattr on the parent, so parents must
    # carry their submodules as real attributes (not the dummy fallback)
    for name in modules:
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(sys.modules[parent], child, sys.modules[name])


@pytest.fixture(scope="module")
def ref_eval():
    """The reference bin-eval/eval_uncertainty.py module, import-stubbed."""
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if not hasattr(np, "bool"):  # reference targets numpy<1.24
        np.bool = np.bool_
    path = os.path.join(REFERENCE, "bin-eval", "eval_uncertainty.py")
    spec = importlib.util.spec_from_file_location("ref_eval_uncertainty", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Identical synthetic per-subject NIfTIs for both stacks."""
    from rcu_tpu.data import nifti

    tmp = tmp_path_factory.mktemp("parity")
    rng = np.random.RandomState(99)
    gt_dir = tmp / "Training"
    pred_dir = tmp / "pred"
    pred_dir.mkdir()
    for i, subject in enumerate(SUBJECTS):
        sdir = gt_dir / ("HGG" if i == 0 else "LGG") / subject
        sdir.mkdir(parents=True)
        seg = (rng.rand(*SHAPE) < 0.35).astype(np.uint8) * 4
        for entry in ("flair", "t1", "t1ce", "t2"):
            img = rng.rand(*SHAPE).astype(np.float32)
            img[img < 0.05] = 0.0  # some zero voxels for the t2>0 mask
            nifti.write(img, str(sdir / f"{subject}_{entry}.nii.gz"))
        nifti.write(seg, str(sdir / f"{subject}_seg.nii.gz"))
        probs = rng.rand(*SHAPE).astype(np.float32)
        nifti.write(probs, str(pred_dir / f"{subject}_probabilities.nii.gz"))
        nifti.write((probs > 0.5).astype(np.uint8),
                    str(pred_dir / f"{subject}_prediction.nii.gz"))
        sigma = (rng.rand(*SHAPE) * 2.5).astype(np.float32)
        nifti.write(sigma, str(pred_dir / f"{subject}_sigma.nii.gz"))
    from rcu_tpu.data.split import save_split
    split_file = str(tmp / "split.json")
    save_split(split_file, [], [], SUBJECTS)
    return tmp, str(gt_dir), str(pred_dir), split_file


def _ref_subject_files(pred_dir, gt_dir):
    """Reference-shaped subject files (categories -> entries -> path)."""
    ns = types.SimpleNamespace
    out = []
    for i, subject in enumerate(SUBJECTS):
        sdir = os.path.join(gt_dir, "HGG" if i == 0 else "LGG", subject)
        out.append(ns(subject=subject, categories={
            "misc": ns(entries={
                "probabilities": os.path.join(
                    pred_dir, f"{subject}_probabilities.nii.gz"),
                "sigma": os.path.join(pred_dir, f"{subject}_sigma.nii.gz"),
            }),
            "labels": ns(entries={
                "gt": os.path.join(sdir, f"{subject}_seg.nii.gz"),
                "prediction": os.path.join(
                    pred_dir, f"{subject}_prediction.nii.gz"),
            }),
            "images": ns(entries={
                "t2": os.path.join(sdir, f"{subject}_t2.nii.gz"),
            }),
        }))
    return out


def _run_reference(ref_eval, artifacts, base_dir, run_id, confidence_entry,
                   details="foreground"):
    tmp, gt_dir, pred_dir, split_file = artifacts
    entry = types.SimpleNamespace(id_=run_id, confidence_entry=confidence_entry,
                                  subject_files=_ref_subject_files(pred_dir,
                                                                   gt_dir))
    min_max_dir = os.path.join(base_dir, "minmax")
    # action-by-action: global rescale reads the minmax CSV at setup time
    for name in ("minmax", "ece_dice", "calib", "bnf_ue"):
        actions = ref_eval.get_actions([name], min_max_dir, base_dir,
                                       details)
        for action in actions:
            action.setup_eval(entry)
            action.start_eval()
            loader = ref_eval.analysis.Loader()
            for sf in entry.subject_files:
                action.eval_subject(sf, loader)
            action.finish_eval()


def _run_ours(artifacts, base_dir, run_id, confidence_entry,
              details="foreground"):
    from rcu_tpu.eval import actions as act_lib
    from rcu_tpu.eval import analysis, evaldata

    tmp, gt_dir, pred_dir, split_file = artifacts
    entry = evaldata.EvalData(run_id, pred_dir, confidence_entry)
    entry = evaldata.get_brats_data(entry, in_dir=gt_dir, split_file=split_file)
    min_max_dir = os.path.join(base_dir, "minmax")
    for name in ("minmax", "ece_dice", "calib", "bnf_ue"):
        actions = act_lib.get_actions([name], min_max_dir, base_dir,
                                      details)
        for action in actions:
            action.setup_eval(entry)
            action.start_eval()
            loader = analysis.Loader()
            for sf in entry.subject_files:
                action.eval_subject(sf, loader)
            action.finish_eval()


def _csv_tree(base_dir):
    out = {}
    for path in glob.glob(os.path.join(base_dir, "**", "*.csv"), recursive=True):
        with open(path) as fp:
            out[os.path.relpath(path, base_dir)] = list(csv.reader(fp))
    return out


def _assert_tree_equal(ref_tree, got_tree):
    assert set(ref_tree) == set(got_tree), (
        sorted(set(ref_tree) ^ set(got_tree)))
    for name, ref_rows in sorted(ref_tree.items()):
        got_rows = got_tree[name]
        assert ref_rows[0] == got_rows[0], (name, ref_rows[0], got_rows[0])
        assert len(ref_rows) == len(got_rows), name
        for ref_row, got_row in zip(ref_rows[1:], got_rows[1:]):
            for col, (rv, gv) in enumerate(zip(ref_row, got_row)):
                try:
                    np.testing.assert_allclose(
                        float(rv), float(gv), rtol=1e-3, atol=1e-4,
                        err_msg=f"{name} col {ref_rows[0][col]}")
                except ValueError:
                    assert rv == gv, (name, ref_rows[0][col], rv, gv)


class TestArtifactParity:
    def test_probabilities_run_csv_families_match(self, ref_eval, artifacts,
                                                  tmp_path):
        """baseline-style run (probabilities entry): minmax + ece(+fg) +
        calibration bins + 11-threshold correction CSVs, both stacks."""
        ref_dir = str(tmp_path / "ref_eval")
        our_dir = str(tmp_path / "our_eval")
        _run_reference(ref_eval, artifacts, ref_dir, "baseline",
                       "probabilities")
        _run_ours(artifacts, our_dir, "baseline", "probabilities")
        ref_tree, got_tree = _csv_tree(ref_dir), _csv_tree(our_dir)
        assert len(ref_tree) == 14  # minmax + ece + calib + 11 thresholds
        _assert_tree_equal(ref_tree, got_tree)

    def test_sigma_run_with_global_rescale_matches(self, ref_eval, artifacts,
                                                   tmp_path):
        """aleatoric-style run (sigma entry): exercises the minmax-driven
        global rescale and the _globalrescale result-id suffix in both."""
        ref_dir = str(tmp_path / "ref_eval_sigma")
        our_dir = str(tmp_path / "our_eval_sigma")
        _run_reference(ref_eval, artifacts, ref_dir, "aleatoric", "sigma")
        _run_ours(artifacts, our_dir, "aleatoric", "sigma")
        ref_tree, got_tree = _csv_tree(ref_dir), _csv_tree(our_dir)
        names = set(ref_tree)
        assert any("globalrescale" in n for n in names)
        _assert_tree_equal(ref_tree, got_tree)

    def test_isic_style_details_match(self, ref_eval, artifacts, tmp_path):
        """ISIC runs use ece_details='' (no fg mask, plain 'ece' dir,
        eval_uncertainty.py:24-26); diff that family too."""
        ref_dir = str(tmp_path / "ref_eval_isic")
        our_dir = str(tmp_path / "our_eval_isic")
        _run_reference(ref_eval, artifacts, ref_dir, "baseline",
                       "probabilities", details="")
        _run_ours(artifacts, our_dir, "baseline", "probabilities", details="")
        ref_tree, got_tree = _csv_tree(ref_dir), _csv_tree(our_dir)
        assert any(n.startswith("ece" + os.sep) for n in ref_tree)
        _assert_tree_equal(ref_tree, got_tree)
