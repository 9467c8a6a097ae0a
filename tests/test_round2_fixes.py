"""Regression tests for the round-2 robustness fixes: CSV row/header
alignment, assembler end-of-loop flush, per-dataset validation metrics, and
the loader reader pool."""
import numpy as np
import pytest

from rcu_tpu.data import h5 as h5_lib
from rcu_tpu.data import loader as loader_lib
from rcu_tpu.data.assembler import Subject2dAssembler, SubjectAssembler
from rcu_tpu.eval import hooks as ev_hooks


class TestCsvRowHeaderAlignment:
    def test_missing_entry_raises(self, tmp_path):
        hook = ev_hooks.WriteCsvHook(str(tmp_path / "x.csv"), entries=("a", "b"))
        hook.on_subject({"a": 1.0, "b": 2.0}, "s1", "run")
        with pytest.raises(KeyError, match="missing result entries"):
            hook.on_subject({"a": 1.0}, "s2", "run")

    def test_complete_rows_written(self, tmp_path):
        path = tmp_path / "x.csv"
        hook = ev_hooks.WriteCsvHook(str(path), entries=("a", "b"))
        hook.on_subject({"a": 1.0, "b": 2.0}, "s1", "run")
        hook.on_run_end({}, "run")
        lines = path.read_text().strip().splitlines()
        assert lines[0] == "test_id,subject_name,a,b"
        assert lines[1] == "run,s1,1.0,2.0"


class _FakeDataset:
    def __init__(self, shapes):
        self.subjects = list(shapes)
        self._shapes = shapes

    def shape(self, subject):
        return self._shapes[subject]


class TestAssemblerFlush:
    def test_partial_subject_reported(self):
        ds = _FakeDataset({"s0": (3, 4, 4)})
        asm = SubjectAssembler(ds, entries=("probabilities",))
        out = {"probabilities": np.zeros((2, 4, 4, 2), np.float32)}
        asm.add_batch(out, [0, 0], [0, 1])  # slice 2 never arrives
        assert asm.subjects_ready() == []
        assert asm.flush() == [0]

    def test_complete_subject_flushes_clean(self):
        ds = _FakeDataset({"s0": (2, 4, 4)})
        asm = SubjectAssembler(ds, entries=("probabilities",))
        out = {"probabilities": np.zeros((2, 4, 4, 2), np.float32)}
        asm.add_batch(out, [0, 0], [0, 1])
        assert asm.subjects_ready() == [0]
        asm.get_assembled_subject(0)
        assert asm.flush() == []

    def test_2d_assembler_flush(self):
        asm = Subject2dAssembler(_FakeDataset({"s0": (4, 4)}),
                                 entries=("probabilities",))
        asm.add_batch({"probabilities": np.zeros((1, 4, 4, 2))}, [0])
        asm.subjects_ready()
        assert asm.flush() == [0]  # stored but never drained
        asm2 = Subject2dAssembler(_FakeDataset({}), entries=("probabilities",))
        assert asm2.flush() == []


class TestValidationMetricKeys:
    """Validation metric keys decide best-checkpoint selection; pin them to
    the reference train scripts (brats: dice+ce, isic: dice+nll)."""

    def _subject(self):
        probs = np.random.RandomState(0).rand(6, 6, 2).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        labels = (np.random.RandomState(1).rand(6, 6) > 0.5).astype(np.uint8)
        return {"probabilities": probs}, {"labels": labels}

    def test_brats_default_keys(self):
        from rcu_tpu.engine.train import default_eval_subject_fn
        results, score = default_eval_subject_fn(*self._subject())
        assert set(results) == {"dice", "ce"}
        assert score == results["dice"]

    def test_isic_default_keys_and_values(self):
        from rcu_tpu import strategies
        sd, info = self._subject()
        results, score = strategies.isic_eval_subject_fn(sd, info)
        assert set(results) == {"dice", "nll"}
        # smooth dice of the argmax (torchfunctions.py:5-14 semantics)
        pred = np.argmax(sd["probabilities"], -1).astype(np.float64)
        tgt = info["labels"].astype(np.float64)
        expected = (2 * (pred * tgt).sum() + 1) / (pred.sum() + tgt.sum() + 1)
        np.testing.assert_allclose(results["dice"], expected, rtol=1e-5)
        # nll = mean -log p[target]
        logp = np.log(sd["probabilities"].reshape(-1, 2))
        expected_nll = -logp[np.arange(36), info["labels"].reshape(-1)].mean()
        np.testing.assert_allclose(results["nll"], expected_nll, rtol=1e-5)
        assert score == results["dice"]

    def test_aleatoric_dice_only(self):
        from rcu_tpu import strategies
        results, _ = strategies.dice_eval_subject_fn(*self._subject())
        assert set(results) == {"dice"}
        results, _ = strategies.isic_smooth_dice_eval_subject_fn(*self._subject())
        assert set(results) == {"dice"}


class TestReaderPool:
    def _store(self, tmp_path, nb_subjects=3, z=4):
        path = str(tmp_path / "store.h5")
        w = h5_lib.DatasetWriter(path)
        rng = np.random.RandomState(7)
        for i in range(nb_subjects):
            w.add_subject(f"s{i}", {
                "images": rng.rand(z, 6, 6, 2).astype(np.float32),
                "labels": (rng.rand(z, 6, 6) > 0.5).astype(np.uint8)})
        w.close()
        return h5_lib.SubjectDataset(path)

    def test_parallel_reads_match_serial(self, tmp_path):
        ds = self._store(tmp_path)
        items = [(s, z) for s in range(3) for z in range(4)]
        serial = loader_lib.SliceBatchLoader(ds, items, batch_size=5)
        pooled = loader_lib.SliceBatchLoader(ds, items, batch_size=5,
                                             num_workers=4)
        for a, b in zip(serial, pooled):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_concurrent_volume_reads_are_bit_exact(self, tmp_path):
        """Both the loader pool and the direct driver's reader pool read
        whole volumes from ONE h5py handle across threads — h5py's global
        lock must keep that bit-exact (pins the build's thread-safety
        assumption)."""
        import concurrent.futures
        ds = self._store(tmp_path, nb_subjects=4, z=6)
        serial = {s: np.asarray(ds.read_volume(s, "images")).copy()
                  for s in ds.subjects}

        def worker(i):
            s = ds.subjects[i % len(ds.subjects)]
            for _ in range(25):
                if not np.array_equal(
                        np.asarray(ds.read_volume(s, "images")), serial[s]):
                    return f"mismatch:{s}"
            return "ok"

        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            results = set(pool.map(worker, range(16)))
        assert results == {"ok"}


class TestTrainTestCsvSchemas:
    """Pin the validation/test CSV column contracts (reference
    WriteValidationMetricsCsvHook / WriteTestMetricsCsvHook,
    common/trainloop/hooks.py:331-400: 'subject' + sorted metric keys)."""

    def test_validation_csv_columns(self, tmp_path):
        from rcu_tpu.engine import hooks as hooks_lib
        path = tmp_path / "validation_metrics.csv"
        hook = hooks_lib.WriteValidationMetricsCsvHook(str(path))
        hook.on_validation_subject_end(None, 0, "s00", {"dice": 0.5, "ce": 0.2})
        hook.on_validation_subject_end(None, 0, "s01", {"dice": 0.7, "ce": 0.1})
        hook.on_validation_end(None, 0, 0.6, True, [])
        lines = path.read_text().strip().splitlines()
        # sorted metric keys after the identifying columns
        assert lines[0] == "epoch,subject,ce,dice"
        assert lines[1].startswith("0,s00,0.2,0.5")

    def test_test_metrics_csv_columns(self, tmp_path):
        from rcu_tpu.engine import hooks as hooks_lib
        path = tmp_path / "metrics.csv"
        hook = hooks_lib.WriteTestMetricsCsvHook(str(path))
        hook.on_test_subject_end(None, "s02", {}, {"dice": 0.9})
        hook.on_test_end(None, [{"dice": 0.9}])
        lines = path.read_text().strip().splitlines()
        assert lines[0] == "subject,dice"
        assert lines[1] == "s02,0.9"


class TestSplitTailAnchoring:
    def test_two_way_fractional_is_consecutive(self):
        from rcu_tpu.data import split as split_lib
        subjects = list("abcdefg")  # 7 subjects, 0.5/0.5 -> 3/3, 'g' dropped
        train, valid = split_lib.split_subjects(subjects, (0.5, 0.5))
        assert train == ["a", "b", "c"]
        assert valid == ["d", "e", "f"]  # consecutive, tail dropped

    def test_three_way_test_group_end_anchored(self):
        from rcu_tpu.data import split as split_lib
        subjects = list("abcdefgh")
        train, valid, test = split_lib.split_subjects(subjects, (4, 2, 2))
        assert (train, valid, test) == (["a", "b", "c", "d"],
                                        ["e", "f"], ["g", "h"])


class TestPatchAssembler:
    def _setup(self, tmp_path, y=10, x=13, z=2):
        from rcu_tpu.data import h5 as h5_mod, indexing
        from rcu_tpu.data.nifti import ImageProperties
        path = str(tmp_path / "p.h5")
        rng = np.random.RandomState(0)
        with h5_mod.DatasetWriter(path) as w:
            w.add_subject("s0", {
                "images": rng.rand(z, y, x, 1).astype(np.float32),
                "labels": (rng.rand(z, y, x) > 0.5).astype(np.uint8)},
                props=ImageProperties(size=(x, y, z)))
        ds = h5_mod.SubjectDataset(path)
        idx = indexing.PatchWiseIndexing((4, 8))
        return ds, idx

    def test_scatter_reassembles_volume(self, tmp_path):
        from rcu_tpu.data.assembler import PatchAssembler
        ds, idx = self._setup(tmp_path)
        items = idx.indices_for(ds, 0)  # 2 slices x 3 x 2 grid = 12
        asm = PatchAssembler(ds, idx, entries=("probabilities",))
        # feed every patch of a known volume through in shuffled order
        vol = np.arange(2 * 10 * 13, dtype=np.float32).reshape(2, 10, 13)
        order = np.random.RandomState(1).permutation(len(items))
        for i in order:
            _, code = items[i]
            patch = idx.extract(ds, "s0", code, "images")[..., 0] * 0  # shape
            # craft the patch payload from the known volume (cropped cells
            # padded with zeros exactly like extraction does)
            py, px = idx.patch_shape
            _, gy_n, gx_n = idx._grid(ds, "s0")
            zi, rest = divmod(code, gy_n * gx_n)
            gy, gx = divmod(rest, gx_n)
            cell = vol[zi, gy * py:(gy + 1) * py, gx * px:(gx + 1) * px]
            patch[:cell.shape[0], :cell.shape[1]] = cell
            asm.add_batch({"probabilities": patch[None]}, [0], [code])
        assert asm.subjects_ready() == [0]
        out = asm.get_assembled_subject(0)["probabilities"]
        np.testing.assert_array_equal(out, vol)
        assert asm.flush() == []

    def test_partial_and_flush_clears(self, tmp_path):
        from rcu_tpu.data.assembler import PatchAssembler
        ds, idx = self._setup(tmp_path)
        asm = PatchAssembler(ds, idx, entries=("probabilities",))
        asm.add_batch({"probabilities": np.zeros((1, 4, 8))}, [0], [0])
        assert asm.subjects_ready() == []
        assert asm.flush() == [0]
        assert asm.flush() == []  # state dropped

    def test_subject_assembler_flush_clears(self):
        ds = _FakeDataset({"s0": (3, 4, 4)})
        asm = SubjectAssembler(ds, entries=("probabilities",))
        asm.add_batch({"probabilities": np.zeros((1, 4, 4, 2))}, [0], [0])
        assert asm.flush() == [0]
        assert asm.flush() == []
