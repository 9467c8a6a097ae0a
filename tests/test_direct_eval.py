"""Direct one-pass test+eval: CSV families, schema, masking, mesh equality."""
import csv
import os

import numpy as np
import pytest

from rcu_tpu import strategies
from rcu_tpu.data import h5, nifti
from rcu_tpu.data.nifti import ImageProperties
from rcu_tpu.data.split import save_split
from rcu_tpu.eval.actions import CORRECTION_KEYS
from rcu_tpu.eval.direct import evaluate_direct
from rcu_tpu.parallel import mesh as mesh_lib
from tests.test_strategies import base_test_cfg, base_train_cfg

pytestmark = pytest.mark.slow

HW = (16, 16)
SLICES = 2


def read_csv(path):
    with open(path) as fp:
        rows = list(csv.reader(fp))
    return rows[0], rows[1:]


def make_store_with_files(tmp_path, nb_subjects=4):
    """H5 store whose files metadata points at real raw t2 NIfTIs (the
    foreground-mask source — stored channels are normalized in production)."""
    rng = np.random.RandomState(3)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir(exist_ok=True)
    path = str(tmp_path / "ds.h5")
    with h5.DatasetWriter(path) as w:
        for i in range(nb_subjects):
            name = f"s{i:02d}"
            gt = np.zeros((SLICES, *HW), np.uint8)
            gt[:, 4:12, 4:12] = 1
            images = rng.rand(SLICES, *HW, 4).astype(np.float32) * 0.1
            images[..., 0] += gt
            t2_raw = rng.rand(SLICES, *HW).astype(np.float32)
            t2_raw[t2_raw < 0.3] = 0.0  # real zero background support
            t2_path = str(raw_dir / f"{name}_t2.nii.gz")
            nifti.write(t2_raw, t2_path)
            w.add_subject(name, {"images": images, "labels": gt},
                          props=ImageProperties(size=(HW[1], HW[0], SLICES)),
                          files={"images": {"t2": t2_path}})
    return path


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("direct")
    store = make_store_with_files(tmp_path)
    split_file = str(tmp_path / "split.json")
    save_split(split_file, ["s00"], ["s01"], ["s02", "s03"])
    cfg = base_train_cfg(tmp_path, store, split_file, name="direct_base",
                         model={"unet": {"depth": 2, "dropout": 0.2,
                                         "in_channels": 4, "nb_classes": 2,
                                         "start_filters": 4}})
    loop = strategies.train_default(cfg)
    return tmp_path, store, split_file, loop


class TestDirectEval:
    def _cfg(self, trained, name):
        tmp_path, store, split_file, loop = trained
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name=name)
        cfg.test_data.batch_size = 2
        return cfg

    def test_csv_families_and_schema(self, trained, tmp_path):
        out_dir = str(tmp_path / "direct_out")
        eces = evaluate_direct(self._cfg(trained, "d1"), out_dir,
                               run_id="baseline", mc=3, masked=False)
        assert set(eces) == {"s02", "s03"}
        files = sorted(os.listdir(out_dir))
        assert "eval_calibration_baseline.csv" in files
        assert sum(1 for f in files if f.startswith("eval_uncertainty")) == 11

        header, body = read_csv(os.path.join(out_dir,
                                             "eval_calibration_baseline.csv"))
        assert "bins_count_00" in header and header[-2:] == ["ece", "dice"]
        assert len(body) == 2 and body[0][1] == "s02"

        header, body = read_csv(os.path.join(
            out_dir, "eval_uncertainty_baseline_th050.csv"))
        assert list(header[2:]) == list(CORRECTION_KEYS)
        assert len(body) == 2

    def test_masked_uses_raw_t2_support(self, trained, tmp_path):
        """masked=True must derive the fg mask from the RAW t2 file, not the
        (normalized) stored channel — masked vs unmasked ECE differ when the
        t2 support excludes voxels."""
        out_m = str(tmp_path / "direct_masked")
        out_u = str(tmp_path / "direct_unmasked")
        cfg = self._cfg(trained, "dm")
        em = evaluate_direct(cfg, out_m, run_id="baseline", mc=3, masked=True)
        eu = evaluate_direct(cfg, out_u, run_id="baseline", mc=3, masked=False)
        assert set(em) == set(eu)
        assert any(abs(em[s] - eu[s]) > 1e-9 for s in em)

    def test_empty_test_split_fails_loudly(self, trained, tmp_path):
        """Zero resolved subjects must raise with the cause, not crash in
        the bounds pass or write a header-only CSV that looks like a run."""
        tmp0, store, split_file, loop = trained
        empty_split = str(tmp_path / "empty_split.json")
        save_split(empty_split, ["s00"], ["s01"], [])
        cfg = base_test_cfg(tmp_path, store, empty_split,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="empty")
        cfg.test_data.batch_size = 2
        with pytest.raises(ValueError, match="no test subjects"):
            evaluate_direct(cfg, str(tmp_path / "empty_out"), mc=3,
                            masked=False)

    def test_empty_dataset_without_split_fails_loudly(self, trained,
                                                      tmp_path):
        """A split-less run over an empty store must also raise with the
        cause — not IndexError in the strategy probe (self-review r3)."""
        empty_store = str(tmp_path / "empty.h5")
        with h5.DatasetWriter(empty_store):
            pass
        _, _, _, loop = trained
        cfg = base_test_cfg(tmp_path, empty_store, None,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="nostore")
        cfg.split = None
        with pytest.raises(ValueError, match="zero subjects"):
            evaluate_direct(cfg, str(tmp_path / "ns_out"), mc=3,
                            masked=False)

    def test_masked_requires_files_metadata(self, trained, tmp_path):
        from tests.test_strategies import make_store
        store = make_store(str(tmp_path / "nofiles.h5"), channels=4)
        split_file = str(tmp_path / "split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        _, _, _, loop = trained
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="nf")
        cfg.test_data.batch_size = 2
        with pytest.raises(ValueError, match="raw t2 source file"):
            evaluate_direct(cfg, str(tmp_path / "nf_out"), mc=3, masked=True)

    def test_mesh_modes_match_single_device(self, trained, tmp_path):
        """Latency (intra-volume sharding) AND throughput (subject-parallel)
        modes produce the same CSVs as the single-device run."""
        single_dir = str(tmp_path / "direct_single")
        cfg = self._cfg(trained, "d2")
        evaluate_direct(cfg, single_dir, run_id="baseline", mc=3, masked=False)
        modes = {
            "latency": dict(mesh=mesh_lib.make_mesh(n_devices=2)),
            "throughput": dict(mesh=mesh_lib.make_mesh(n_devices=2),
                               subject_parallel=True),
        }
        for mode, kwargs in modes.items():
            mode_dir = str(tmp_path / f"direct_{mode}")
            evaluate_direct(cfg, mode_dir, run_id="baseline", mc=3,
                            masked=False, **kwargs)
            for name in sorted(os.listdir(single_dir)):
                h1, b1 = read_csv(os.path.join(single_dir, name))
                h2, b2 = read_csv(os.path.join(mode_dir, name))
                assert h1 == h2, (mode, name)
                assert len(b1) == len(b2), (mode, name)
                for r1, r2 in zip(b1, b2):
                    for v1, v2 in zip(r1, r2):
                        try:
                            np.testing.assert_allclose(
                                float(v1), float(v2), rtol=1e-4, atol=1e-6)
                        except ValueError:
                            assert v1 == v2, (mode, name, v1, v2)

    def test_fast_decoder_mesh_matches_single_device(self, trained,
                                                     tmp_path):
        """The fast decoder's split/dilated convs must survive GSPMD
        sharding: a latency-mode mesh run with fast_decoder=True produces
        the same CSVs as the single-device fast_decoder run (this repo has
        had a GSPMD miscompile on member-sharded paths before — sharding
        coverage is not optional for new conv forms)."""
        single_dir = str(tmp_path / "fast_single")
        cfg = self._cfg(trained, "d2")
        evaluate_direct(cfg, single_dir, run_id="baseline", mc=3,
                        masked=False, fast_decoder=True)
        mesh_dir = str(tmp_path / "fast_mesh")
        evaluate_direct(cfg, mesh_dir, run_id="baseline", mc=3, masked=False,
                        fast_decoder=True,
                        mesh=mesh_lib.make_mesh(n_devices=2))
        for name in sorted(os.listdir(single_dir)):
            h1, b1 = read_csv(os.path.join(single_dir, name))
            h2, b2 = read_csv(os.path.join(mesh_dir, name))
            assert h1 == h2, name
            assert len(b1) == len(b2), name
            for r1, r2 in zip(b1, b2):
                for v1, v2 in zip(r1, r2):
                    try:
                        np.testing.assert_allclose(
                            float(v1), float(v2), rtol=1e-4, atol=1e-6)
                    except ValueError:
                        assert v1 == v2, (name, v1, v2)

    def test_latency_mesh_pads_indivisible_batch(self, trained, tmp_path):
        """Latency mode shards the batch axis, so an indivisible batch size
        (e.g. the forced batch of 1 on native-2D datasets) must be rounded up
        to the mesh, not crash with a divisibility error. Padding changes the
        per-slice RNG schedule, so only schema/finiteness are asserted."""
        cfg = self._cfg(trained, "d3")
        cfg.test_data.batch_size = 1
        out_dir = str(tmp_path / "direct_pad")
        eces = evaluate_direct(cfg, out_dir, run_id="baseline", mc=3,
                               masked=False,
                               mesh=mesh_lib.make_mesh(n_devices=2))
        assert set(eces) == {"s02", "s03"}
        assert all(np.isfinite(v) for v in eces.values())
        files = sorted(os.listdir(out_dir))
        assert sum(1 for f in files if f.startswith("eval_uncertainty")) == 11

    def test_3d_size_transform_applies_per_slice(self, trained, tmp_path):
        """A spatial `size` transform must see (H,W,C) slice items exactly as
        the staged loader does. Size([16,16]) is a no-op per slice, but
        applied to the whole (Z,H,W,C) volume it would pad the SLICE axis
        2 -> 16 and corrupt every result."""
        plain = evaluate_direct(self._cfg(trained, "d4"),
                                str(tmp_path / "direct_plain"),
                                run_id="baseline", mc=3, masked=False)
        cfg = self._cfg(trained, "d5")
        cfg.test_data.transform = [{"size": {"size": list(HW)}}]
        sized = evaluate_direct(cfg, str(tmp_path / "direct_sized"),
                                run_id="baseline", mc=3, masked=False)
        assert sized == plain

    def test_masked_shape_mismatch_raises(self, trained, tmp_path):
        """A raw-t2 mask whose geometry disagrees with the target must fail
        with a per-subject message, not an opaque jit shape error."""
        rng = np.random.RandomState(5)
        store = str(tmp_path / "badmask.h5")
        bad_t2 = str(tmp_path / "bad_t2.nii.gz")
        nifti.write(rng.rand(SLICES, 8, 8).astype(np.float32), bad_t2)
        with h5.DatasetWriter(store) as w:
            for name in ("s00", "s01", "s02"):
                gt = (rng.rand(SLICES, *HW) > 0.7).astype(np.uint8)
                w.add_subject(
                    name,
                    {"images": rng.rand(SLICES, *HW, 4).astype(np.float32),
                     "labels": gt},
                    props=ImageProperties(size=(HW[1], HW[0], SLICES)),
                    files={"images": {"t2": bad_t2}})
        split_file = str(tmp_path / "bad_split.json")
        save_split(split_file, ["s00"], ["s01"], ["s02"])
        _, _, _, loop = trained
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"mc": 3}, name="badmask")
        cfg.test_data.batch_size = 2
        with pytest.raises(ValueError, match="does not match the target"):
            evaluate_direct(cfg, str(tmp_path / "bad_out"), mc=3, masked=True)

    def test_aleatoric_model_uses_sigma_protocol(self, trained, tmp_path):
        """A sigma-headed checkpoint must evaluate via the aleatoric protocol
        (global sigma rescale + fold by prediction, '_globalrescale' ids),
        and the numbers must match a numpy recomputation from the model's
        own deterministic outputs."""
        import jax
        from rcu_tpu import strategies
        from rcu_tpu.engine import steps as steps_lib
        from tests.test_ops_calibration import oracle_ece
        from tests.test_strategies import base_train_cfg

        tmp0, store, split_file, _ = trained
        cfg_t = base_train_cfg(tmp_path, store, split_file, name="alea",
                               others={"is_log_sigma": True},
                               model={"unet": {"depth": 2, "dropout": 0.2,
                                               "in_channels": 4,
                                               "nb_classes": 2,
                                               "start_filters": 4,
                                               "sigma_out": True}})
        loop = strategies.train_aleatoric(cfg_t)
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"is_log_sigma": True}, name="alea_t")
        cfg.test_data.batch_size = 2
        out_dir = str(tmp_path / "alea_out")
        eces = evaluate_direct(cfg, out_dir, run_id="aleatoric",
                               masked=False)
        files = sorted(os.listdir(out_dir))
        assert "eval_calibration_aleatoric_globalrescale.csv" in files
        assert "eval_summary_minmax_aleatoric.csv" in files
        assert ("eval_uncertainty_aleatoric_globalrescale_th050.csv"
                in files)

        # numpy oracle from the deterministic forward of every test subject
        from rcu_tpu.data import h5
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.eval.direct import _load_model_state
        model, params, batch_stats = _load_model_state(
            loop.model_files.model_dir, "best", (1, *HW, 4))
        predict = steps_lib.make_aleatoric_predict_fn(model, True)
        ds = h5.SubjectDataset(store)
        per_subject = {}
        for subject in eces:
            vol = np.asarray(ds.read_volume(subject, "images"), np.float32)
            out = predict(params, batch_stats, {"images": vol})
            probs = np.asarray(out["probabilities"])
            pred = np.argmax(probs, axis=-1)
            sigma = np.asarray(out["sigma"])
            gt = np.squeeze(np.asarray(ds.read_volume(subject, "labels")))
            per_subject[subject] = (pred, sigma, (gt > 0.5).astype(np.uint8))
        gmin = min(float(s.min()) for _, s, _ in per_subject.values())
        gmax = max(float(s.max()) for _, s, _ in per_subject.values())
        eps = 1e-5
        for subject, (pred, sigma, gt) in per_subject.items():
            resc = (sigma - gmin) / (gmax - gmin) * (1 - 2 * eps) + eps
            folded = np.where(pred == 1, 1.0 - resc * 0.5, resc * 0.5)
            probs2 = np.stack([1 - folded, folded], -1).astype(np.float64)
            expected = oracle_ece(probs2, gt.astype(np.float64))
            np.testing.assert_allclose(eces[subject], expected,
                                       rtol=1e-4, atol=1e-6)

    def test_aleatoric_mesh_matches_single_device(self, trained, tmp_path):
        """The aleatoric programs' mesh shardings must reproduce the
        single-device CSVs (deterministic forward -> exact comparison)."""
        from rcu_tpu import strategies
        from tests.test_strategies import base_train_cfg
        tmp0, store, split_file, _ = trained
        loop = strategies.train_aleatoric(base_train_cfg(
            tmp_path, store, split_file, name="aleam",
            others={"is_log_sigma": False},
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 4,
                            "nb_classes": 2, "start_filters": 4,
                            "sigma_out": True}}))
        cfg = base_test_cfg(tmp_path, store, split_file,
                            loop.model_files.model_dir,
                            others={"is_log_sigma": False}, name="aleam_t")
        cfg.test_data.batch_size = 2
        single_dir = str(tmp_path / "alea_single")
        evaluate_direct(cfg, single_dir, run_id="aleatoric", masked=False)
        mesh_dir = str(tmp_path / "alea_mesh")
        evaluate_direct(cfg, mesh_dir, run_id="aleatoric", masked=False,
                        mesh=mesh_lib.make_mesh(n_devices=2))
        for name in sorted(os.listdir(single_dir)):
            h1, b1 = read_csv(os.path.join(single_dir, name))
            h2, b2 = read_csv(os.path.join(mesh_dir, name))
            assert h1 == h2, name
            for r1, r2 in zip(b1, b2):
                for v1, v2 in zip(r1, r2):
                    try:
                        np.testing.assert_allclose(float(v1), float(v2),
                                                   rtol=1e-4, atol=1e-6)
                    except ValueError:
                        assert v1 == v2, (name, v1, v2)

    def test_2d_heterogeneous_sizes_split_chunks(self, trained, tmp_path):
        """Images of different sizes inside one chunk must split into
        same-shape sub-batches (raw ISIC images are not size-normalized),
        not crash np.stack."""
        from PIL import Image
        from tests.test_strategies import make_store
        img_dir = tmp_path / "ISIC-2017_Test_v2_Data"
        gt_dir = tmp_path / "ISIC-2017_Test_v2_Part1_GroundTruth"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        names, sizes = [], [(16, 16), (24, 16), (16, 16)]
        for i, (ih, iw) in enumerate(sizes):
            name = f"ISIC_{i:07d}"
            names.append(name)
            Image.fromarray((rng.rand(ih, iw, 3) * 255).astype(np.uint8)).save(
                str(img_dir / f"{name}.jpg"))
            Image.fromarray(((rng.rand(ih, iw) > 0.5) * 255).astype(
                np.uint8)).save(str(gt_dir / f"{name}_segmentation.png"))
        split2 = str(tmp_path / "het_split.json")
        save_split(split2, [], [], names)
        store3 = make_store(str(tmp_path / "h3.h5"), channels=3)
        split3 = str(tmp_path / "h3_split.json")
        save_split(split3, ["s00"], ["s01"], ["s02"])
        from rcu_tpu import strategies
        from tests.test_strategies import base_train_cfg
        mloop = strategies.train_default(base_train_cfg(
            tmp_path, store3, split3, name="h3",
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 3,
                            "nb_classes": 2, "start_filters": 4}}))
        cfg = base_test_cfg(tmp_path, str(tmp_path / "ISIC-2017_Test_v2"),
                            split2, mloop.model_files.model_dir,
                            others={"mc": 2}, name="het")
        cfg.test_data.batch_size = 3  # all three sizes share one chunk
        cfg.test_data.transform = [
            {"rescale": {"lower": 0.0, "upper": 1.0, "entries": ["images"]}}]
        out_dir = str(tmp_path / "het_out")
        eces = evaluate_direct(cfg, out_dir, run_id="baseline", mc=2,
                               masked=False)
        assert set(eces) == set(names)
        _, body = read_csv(os.path.join(out_dir,
                                        "eval_calibration_baseline.csv"))
        assert len(body) == 3

    def test_2d_dataset_runs(self, trained, tmp_path):
        """Native-2D (ISIC-style) folder dataset: one-slice volumes, the
        config transform applied, unmasked eval."""
        from PIL import Image
        tmp0, store, split_file, loop = trained
        # collector layout: <root>_Data / <root>_Part1_GroundTruth siblings
        data_root = tmp_path / "ISIC-2017_Test_v2"
        img_dir = tmp_path / "ISIC-2017_Test_v2_Data"
        gt_dir = tmp_path / "ISIC-2017_Test_v2_Part1_GroundTruth"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        rng = np.random.RandomState(0)
        names = []
        for i in range(2):
            name = f"ISIC_{i:07d}"
            names.append(name)
            arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(img_dir / f"{name}.jpg"))
            gt = (rng.rand(16, 16) > 0.5).astype(np.uint8) * 255
            Image.fromarray(gt).save(
                str(gt_dir / f"{name}_segmentation.png"))
        split2 = str(tmp_path / "isic_split.json")
        save_split(split2, [], [], names)
        # model trained on 4 channels won't fit 3-channel ISIC images; train a
        # tiny 3-channel model instead
        from tests.test_strategies import make_store
        store3 = make_store(str(tmp_path / "s3.h5"), channels=3)
        split3 = str(tmp_path / "s3_split.json")
        save_split(split3, ["s00"], ["s01"], ["s02"])
        mloop = strategies.train_default(base_train_cfg(
            tmp_path, store3, split3, name="m3",
            model={"unet": {"depth": 2, "dropout": 0.2, "in_channels": 3,
                            "nb_classes": 2, "start_filters": 4}}))
        cfg = base_test_cfg(tmp_path, str(data_root), split2,
                            mloop.model_files.model_dir,
                            others={"mc": 2}, name="isic_direct")
        cfg.test_data.transform = [
            {"rescale": {"lower": 0.0, "upper": 1.0, "entries": ["images"]}}]
        out_dir = str(tmp_path / "isic_direct_out")
        eces = evaluate_direct(cfg, out_dir, run_id="baseline", mc=2,
                               masked=False)
        assert set(eces) == set(names)
        header, body = read_csv(os.path.join(out_dir,
                                             "eval_calibration_baseline.csv"))
        assert len(body) == 2
