"""Data engine tests: NIfTI round-trip, H5 store, split contract, indexing,
loader static shapes, slice->volume assembly."""
import json
import os

import numpy as np
import pytest

from rcu_tpu.data import assembler, h5, indexing, loader, nifti, split
from rcu_tpu.data.nifti import ImageProperties


class TestNifti:
    @pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
    def test_roundtrip_3d(self, tmp_path, dtype):
        arr = (np.random.RandomState(0).rand(5, 7, 9) * 100).astype(dtype)
        props = ImageProperties(size=(9, 7, 5), spacing=(1.5, 2.0, 3.0),
                                origin=(-10.0, 4.0, 2.5))
        path = str(tmp_path / "x.nii.gz")
        nifti.write(arr, path, props)
        back, props2 = nifti.read(path)
        np.testing.assert_array_equal(back, arr)
        assert props2.size == (9, 7, 5)
        np.testing.assert_allclose(props2.spacing, (1.5, 2.0, 3.0), rtol=1e-6)
        np.testing.assert_allclose(props2.origin, (-10.0, 4.0, 2.5), atol=1e-5)
        np.testing.assert_allclose(props2.direction_matrix(), np.eye(3), atol=1e-6)

    def test_roundtrip_uncompressed(self, tmp_path):
        arr = np.random.RandomState(1).rand(4, 6, 8).astype(np.float32)
        path = str(tmp_path / "x.nii")
        nifti.write(arr, path)
        back, _ = nifti.read(path)
        np.testing.assert_array_equal(back, arr)

    def test_2d_roundtrip(self, tmp_path):
        arr = (np.random.RandomState(2).rand(192, 256) > 0.5).astype(np.uint8)
        path = str(tmp_path / "seg.nii.gz")
        nifti.write(arr, path)
        back, props = nifti.read(path)
        np.testing.assert_array_equal(back, arr)
        assert props.size == (256, 192)

    def test_bool_written_as_uint8(self, tmp_path):
        arr = np.random.RandomState(3).rand(3, 4, 5) > 0.5
        path = str(tmp_path / "b.nii.gz")
        nifti.write(arr, path)
        back, _ = nifti.read(path)
        assert back.dtype == np.uint8
        np.testing.assert_array_equal(back, arr.astype(np.uint8))

    def test_read_returns_writable_array(self, tmp_path):
        """Unscaled reads must not hand back a read-only view of the file
        buffer — in-place ops would raise data-dependently."""
        arr = np.random.RandomState(4).rand(3, 4, 5).astype(np.float32)
        path = str(tmp_path / "w.nii")
        nifti.write(arr, path)
        back, _ = nifti.read(path)
        assert back.flags.writeable
        back *= 0.0  # must not raise

    @staticmethod
    def _patch_header(path, patches):
        """patches: list of (offset, struct_fmt, values tuple)."""
        import struct as _struct
        with open(path, "r+b") as f:
            data = bytearray(f.read())
            for off, fmt, vals in patches:
                _struct.pack_into(fmt, data, off, *vals)
            f.seek(0)
            f.write(data)

    def test_scl_slope_nan_or_zero_disables_scaling(self, tmp_path):
        """NIfTI-1 spec: scl_slope == 0 (or NaN, written by some converters)
        means NO scaling — scl_inter must not be applied either."""
        arr = np.random.RandomState(5).rand(3, 4, 5).astype(np.float32)
        for slope, inter in ((np.nan, 7.0), (0.0, 123.0)):
            path = str(tmp_path / f"s_{inter}.nii")
            nifti.write(arr, path)
            self._patch_header(path, [(112, "<2f", (slope, inter))])
            back, _ = nifti.read(path)
            np.testing.assert_array_equal(back, arr)

    def test_scl_inter_nan_treated_as_zero(self, tmp_path):
        """A NaN intercept with a valid slope means 'unset' (nibabel treats
        it as 0) — it must not poison every voxel with NaN."""
        arr = np.random.RandomState(8).rand(3, 4, 5).astype(np.float32)
        # slope 1 + NaN inter: no-op scaling
        path = str(tmp_path / "i1.nii")
        nifti.write(arr, path)
        self._patch_header(path, [(112, "<2f", (1.0, np.nan))])
        back, _ = nifti.read(path)
        np.testing.assert_array_equal(back, arr)
        # slope 2 + NaN inter: slope applies, inter contributes 0
        path = str(tmp_path / "i2.nii")
        nifti.write(arr, path)
        self._patch_header(path, [(112, "<2f", (2.0, np.nan))])
        back, _ = nifti.read(path)
        np.testing.assert_allclose(back, arr * 2.0, rtol=1e-6)

    def test_write_preserves_int_dtype_for_nonnative_byteorder(self, tmp_path):
        """A big-endian int array (e.g. round-tripped from a >i2 file) must
        be written as int16, not silently converted to float32 by the
        byte-order-sensitive dtype-code lookup."""
        arr = np.arange(24, dtype=">i2").reshape(2, 3, 4)
        path = str(tmp_path / "be.nii")
        nifti.write(arr, path)
        back, _ = nifti.read(path)
        assert back.dtype == np.int16
        np.testing.assert_array_equal(back, arr.astype(np.int16))

    def test_qform_fallback_recovers_geometry(self, tmp_path):
        """sform_code == 0 with qform_code > 0 (typical FSL output) must
        recover origin/spacing/direction from the quaternion fields instead
        of silently dropping them."""
        arr = np.random.RandomState(6).rand(5, 7, 9).astype(np.float32)
        props = ImageProperties(size=(9, 7, 5), spacing=(1.5, 2.0, 3.0),
                                origin=(-10.0, 4.0, 2.5))
        path = str(tmp_path / "q.nii")
        nifti.write(arr, path, props)
        ref_back, ref_props = nifti.read(path)  # via sform
        # copy the sform translation (RAS) into qoffset_{x,y,z}; identity
        # LPS direction is diag(-1,-1,1) in RAS = a 180-degree z-rotation,
        # quaternion (b,c,d) = (0,0,1); then disable the sform
        import struct as _struct
        with open(path, "rb") as f:
            hdr = f.read(348)
        tx = _struct.unpack_from("<f", hdr, 280 + 12)[0]
        ty = _struct.unpack_from("<f", hdr, 280 + 28)[0]
        tz = _struct.unpack_from("<f", hdr, 280 + 44)[0]
        self._patch_header(path, [
            (252, "<2h", (1, 0)),            # qform_code=1, sform_code=0
            (256, "<3f", (0.0, 0.0, 1.0)),
            (268, "<3f", (tx, ty, tz)),
        ])
        back, props2 = nifti.read(path)
        np.testing.assert_array_equal(back, ref_back)
        np.testing.assert_allclose(props2.origin, ref_props.origin, atol=1e-5)
        np.testing.assert_allclose(props2.spacing, ref_props.spacing,
                                   rtol=1e-6)
        np.testing.assert_allclose(props2.direction_matrix(),
                                   ref_props.direction_matrix(), atol=1e-6)


def _make_store(path, nb_subjects=3, nb_slices=4, shape=(6, 8), channels=2):
    rng = np.random.RandomState(5)
    with h5.DatasetWriter(path) as w:
        for i in range(nb_subjects):
            name = f"subj_{i}"
            images = rng.rand(nb_slices, *shape, channels).astype(np.float32)
            if i == 0:  # subject with black slices for selection tests
                images[0] = 0.0
                images[2] = 0.0
            labels = (rng.rand(nb_slices, *shape) > 0.7).astype(np.uint8)
            w.add_subject(name, {"images": images, "labels": labels},
                          props=ImageProperties(size=(shape[1], shape[0], nb_slices)),
                          meta={"grade": "HGG" if i % 2 == 0 else "LGG"},
                          files={"images": {"t2": f"/tmp/{name}_t2.nii.gz"}})
    return path


class TestH5Store:
    def test_roundtrip(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        assert ds.subjects == ["subj_0", "subj_1", "subj_2"]
        assert ds.categories() == ["images", "labels"]
        assert ds.shape("subj_0") == (4, 6, 8, 2)
        sl = ds.read_slice("subj_1", 2, "images")
        vol = ds.read_volume("subj_1", "images")
        np.testing.assert_array_equal(sl, vol[2])
        assert ds.meta("subj_0")["grade"] == "HGG"
        assert ds.files("subj_0")["images"]["t2"].endswith("_t2.nii.gz")
        assert ds.properties("subj_0").size == (8, 6, 4)

    def test_writer_does_not_finalize_on_error(self, tmp_path):
        """A crash mid-build must NOT leave a valid-looking partial store:
        the subjects index is only written on clean exit, so a later open
        fails loudly instead of training on truncated data."""
        path = str(tmp_path / "partial.h5")
        with pytest.raises(RuntimeError, match="boom"):
            with h5.DatasetWriter(path) as w:
                w.add_subject("s0", {"images": np.zeros((2, 4, 4, 1),
                                                        np.float32)})
                raise RuntimeError("boom")
        with pytest.raises(Exception):
            h5.SubjectDataset(path)

    def test_writer_close_is_idempotent(self, tmp_path):
        path = str(tmp_path / "closed.h5")
        with h5.DatasetWriter(path) as w:
            w.add_subject("s0", {"images": np.zeros((2, 4, 4, 1),
                                                    np.float32)})
            w.close()  # explicit close before __exit__ must not raise
        assert h5.SubjectDataset(path).subjects == ["s0"]

    def test_subject_subset(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path, subject_subset=["subj_2", "subj_0"])
        assert ds.subjects == ["subj_0", "subj_2"]  # dataset order preserved
        with pytest.raises(ValueError):
            h5.SubjectDataset(path, subject_subset=["nope"])


class TestSplit:
    def test_json_contract(self, tmp_path):
        f = str(tmp_path / "split.json")
        split.save_split(f, ["a", "b"], ["c"], ["d", "e"])
        with open(f) as fh:
            raw = json.load(fh)
        assert set(raw.keys()) == {"train", "valid", "test"}
        tr, va, te = split.load_split(f)
        assert (tr, va, te) == (["a", "b"], ["c"], ["d", "e"])

    def test_k_fold_load(self, tmp_path):
        f = str(tmp_path / "split.json")
        folds = split.split_subjects_k_fold(list("abcdef"), 3)
        split.save_split(f, [t for t, _ in folds], [v for _, v in folds], None)
        tr, va, te = split.load_split(f, k=1)
        assert va == ["c", "d"] and te == []
        assert tr == ["a", "b", "e", "f"]

    def test_split_sizes(self):
        tr, va, te = split.split_subjects(list(range(10)), (6, 2, 2))
        assert (len(tr), len(va), len(te)) == (6, 2, 2)
        with pytest.raises(ValueError):
            split.split_subjects(list(range(10)), (5, 2, 2))

    def test_stratified_shuffled(self):
        subjects = [f"s{i}" for i in range(20)]
        strat = ["x"] * 10 + ["y"] * 10
        tr, va, te = split.create_stratified_shuffled_split(subjects, strat, (12, 4, 4))
        assert len(tr) == 12 and len(va) == 4 and len(te) == 4
        assert not (set(tr) & set(va)) and not (set(tr) & set(te))


class TestIndexing:
    def test_slice_indexing_and_selection(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())
        assert len(idx) == 12 and idx[0] == (0, 0)
        sel = indexing.select_indices(ds, indexing.SliceIndexing(),
                                      indexing.NoneBlackSelection())
        # subject 0 has 2 black slices
        assert len(sel) == 10
        assert (0, 0) not in sel and (0, 2) not in sel

    def test_index_cache(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        sel1 = indexing.calculate_or_load_indices(
            ds, indexing.SliceIndexing(), indexing.NoneBlackSelection())
        cache_dir = os.path.join(str(tmp_path), "indices")
        assert len(os.listdir(cache_dir)) == 1
        sel2 = indexing.calculate_or_load_indices(
            ds, indexing.SliceIndexing(), indexing.NoneBlackSelection())
        assert sel1 == sel2
        # different subset -> different cache key
        ds2 = h5.SubjectDataset(path, subject_subset=["subj_1"])
        indexing.calculate_or_load_indices(
            ds2, indexing.SliceIndexing(), indexing.NoneBlackSelection())
        assert len(os.listdir(cache_dir)) == 2

    def test_empty_indexing(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.EmptyIndexing())
        assert idx == [(0, -1), (1, -1), (2, -1)]


class TestLoader:
    def test_static_shapes_with_ragged_tail(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())  # 12 items
        ld = loader.SliceBatchLoader(ds, idx, batch_size=5)
        batches = list(iter(ld))
        assert len(batches) == len(ld) == 3
        for b in batches:
            assert b["images"].shape == (5, 6, 8, 2)
            assert b["labels"].shape == (5, 6, 8)
            assert b["valid"].shape == (5,)
        assert batches[-1]["valid"].sum() == 2  # 12 = 5+5+2

    def test_shuffle_determinism_per_epoch(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())
        ld = loader.SliceBatchLoader(ds, idx, batch_size=4, shuffle=True, seed=3)
        ld.set_epoch(1)
        order1 = [tuple(b["subject_index"]) for b in ld]
        order1b = [tuple(b["subject_index"]) for b in ld]
        assert order1 == order1b
        ld.set_epoch(2)
        order2 = [tuple(b["subject_index"]) for b in ld]
        assert order1 != order2

    def test_direct_collate_matches_copying_collate(self, tmp_path):
        """The read_direct fast path (engaged: no transform, slice indexing)
        must be bit-identical to the per-item read + np.stack collate (forced
        here via an identity transform, which disables the fast path)."""
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())
        fast = loader.SliceBatchLoader(ds, idx, batch_size=5)
        slow = loader.SliceBatchLoader(ds, idx, batch_size=5,
                                       transform=lambda d: d)
        assert fast._collate_direct(np.arange(3)) is not None
        assert slow._collate_direct(np.arange(3)) is None
        for fb, sb in zip(fast, slow):
            assert set(fb) == set(sb)
            for k in fb:
                assert fb[k].dtype == sb[k].dtype
                np.testing.assert_array_equal(fb[k], sb[k])

    def test_read_slice_into_rejects_mismatch(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        subj = ds.subjects[0]
        good = np.empty((2,) + tuple(ds.shape(subj, "images")[1:]),
                        ds.dtype(subj, "images"))
        assert ds.read_slice_into(subj, 0, "images", good, 0)
        np.testing.assert_array_equal(good[0], ds.read_slice(subj, 0, "images"))
        wrong_shape = np.empty((2, 3, 3), good.dtype)
        assert not ds.read_slice_into(subj, 0, "images", wrong_shape, 0)
        wrong_dtype = np.empty_like(good, dtype=np.float64)
        assert not ds.read_slice_into(subj, 0, "images", wrong_dtype, 0)

    def test_shard_partitions_epoch_order(self, tmp_path):
        """Per-host sharding (multi-host DP feed): shards are disjoint,
        equal-length (lockstep batch counts), stride the globally shuffled
        epoch order, and reshuffle across hosts every epoch."""
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())  # 12 items

        def items_of(ld):
            out = []
            for b in ld:
                n = int(b["valid"].sum())
                out += list(zip(b["subject_index"][:n].tolist(),
                                b["slice_index"][:n].tolist()))
            return out

        shards = [loader.SliceBatchLoader(ds, idx, batch_size=2, shuffle=True,
                                          seed=7, shard=(k, 3))
                  for k in range(3)]
        per_shard = [items_of(s) for s in shards]
        assert all(len(p) == 4 for p in per_shard)  # 12 // 3, equal lengths
        assert all(len(s) == 2 for s in shards)  # __len__ reflects the shard
        flat = [t for p in per_shard for t in p]
        assert len(set(flat)) == len(flat)  # disjoint
        # striding the same globally shuffled order: epoch change reshuffles
        # consistently across shards (still disjoint)
        for s in shards:
            s.set_epoch(1)
        per_shard_e1 = [items_of(s) for s in shards]
        assert per_shard_e1 != per_shard
        flat1 = [t for p in per_shard_e1 for t in p]
        assert len(set(flat1)) == len(flat1)
        with pytest.raises(ValueError, match="shard"):
            loader.SliceBatchLoader(ds, idx, batch_size=2, shard=(3, 3))

    def test_chunked_shuffle_epoch_properties(self, tmp_path):
        """shuffle_chunk>1: the epoch is a permutation of CHUNKS of
        consecutive indices — exact cover, chunks kept contiguous (the
        property the direct collate's run-coalescer feeds on), chunk order
        AND chunk-origin offset reshuffled per epoch, deterministic per
        (seed, epoch)."""
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())  # 12 items
        c, seed, n = 4, 3, 12
        ld = loader.SliceBatchLoader(ds, idx, batch_size=4, shuffle=True,
                                     seed=seed, shuffle_chunk=c)
        assert len(ld) == 3  # length unchanged by the chunked order
        orders, offsets = [], set()
        for epoch in range(8):
            ld.set_epoch(epoch)
            order = ld._epoch_order().tolist()
            assert sorted(order) == list(range(n))  # exact cover
            # the epoch's chunk-origin offset is deterministic in
            # (seed, epoch); the order must be a permutation of exactly the
            # chunk segments that offset induces (head / full chunks / tail)
            off = int(np.random.RandomState(seed + epoch).randint(c))
            offsets.add(off)
            segs = []
            if off:
                segs.append(list(range(off)))
            segs += [list(range(k, min(k + c, n)))
                     for k in range(off, n, c)]
            by_first = {s[0]: s for s in segs}
            pos, used = 0, set()
            while pos < n:
                seg = by_first[order[pos]]
                assert order[pos:pos + len(seg)] == seg
                assert seg[0] not in used
                used.add(seg[0])
                pos += len(seg)
            assert ld._epoch_order().tolist() == order  # determinism
            orders.append(order)
        assert len({tuple(o) for o in orders}) > 1  # epochs reshuffle
        # the offset actually rotates chunk boundaries across epochs, so no
        # fixed item set is pinned to the partial chunks
        assert len(offsets) > 1
        with pytest.raises(ValueError, match="shuffle_chunk"):
            loader.SliceBatchLoader(ds, idx, batch_size=4, shuffle_chunk=-1)

    def test_chunked_shuffle_batches_match_copying_collate(self, tmp_path):
        """Chunked-shuffle batches ride the direct collate and must stay
        bit-identical to the per-item copying collate over the same order."""
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())
        kw = dict(batch_size=5, shuffle=True, seed=9, shuffle_chunk=3)
        fast = loader.SliceBatchLoader(ds, idx, **kw)
        slow = loader.SliceBatchLoader(ds, idx, transform=lambda d: d, **kw)
        for fb, sb in zip(fast, slow):
            assert set(fb) == set(sb)
            for k in fb:
                assert fb[k].dtype == sb[k].dtype
                np.testing.assert_array_equal(fb[k], sb[k])
        # selection-filtered index lists have z-gaps inside chunks: the
        # coalescer just splits runs at the gaps — bit-equality must hold
        gappy = [it for j, it in enumerate(idx) if j % 3 != 1]
        fast_g = loader.SliceBatchLoader(ds, gappy, **kw)
        slow_g = loader.SliceBatchLoader(ds, gappy, transform=lambda d: d,
                                         **kw)
        for fb, sb in zip(fast_g, slow_g):
            for k in fb:
                np.testing.assert_array_equal(fb[k], sb[k])

    def test_chunked_shuffle_shards_whole_chunks(self, tmp_path):
        """shard + shuffle_chunk: hosts take disjoint FULL chunks (row
        striding would break every coalesced run), equal batch counts;
        dropped partial-chunk items ROTATE with the per-epoch offset (no
        item is starved for the whole run), and a shard grid the chunk
        count cannot fill fails loudly instead of yielding empty epochs."""
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())  # 12 items
        c = 3
        shards = [loader.SliceBatchLoader(ds, idx, batch_size=3, shuffle=True,
                                          seed=7, shuffle_chunk=c,
                                          shard=(k, 2))
                  for k in range(2)]
        seen = [set(), set()]
        lengths = set()
        for epoch in range(10):
            for s in shards:
                s.set_epoch(epoch)
            per_shard = [s._epoch_order().tolist() for s in shards]
            # equal lockstep lengths, whole contiguous chunks, disjoint
            assert len(per_shard[0]) == len(per_shard[1]) > 0
            assert len(per_shard[0]) % c == 0
            lengths.add(len(per_shard[0]))
            for p in per_shard:
                for k in range(0, len(p), c):
                    assert p[k:k + c] == list(range(p[k], p[k] + c))
            flat = per_shard[0] + per_shard[1]
            assert len(set(flat)) == len(flat)  # disjoint across hosts
            for k, p in enumerate(per_shard):
                seen[k].update(p)
        # across epochs the offset rotates the dropped items: the union of
        # everything yielded covers the full index list
        assert seen[0] | seen[1] == set(range(12))
        # ...at a CONSTANT per-epoch length (TensorBoard global steps and
        # the fused-ensemble step count assume epochs of equal size)
        assert len(lengths) == 1
        # fail-loud when there are fewer full chunks than shards (a silent
        # empty epoch on every host would train on nothing)
        starved = loader.SliceBatchLoader(ds, idx, batch_size=3, shuffle=True,
                                          seed=7, shuffle_chunk=8,
                                          shard=(0, 4))
        with pytest.raises(ValueError, match="full chunks"):
            starved._epoch_order()

    def test_shuffle_chunk_config_roundtrip(self):
        from rcu_tpu.engine import config as cfg_lib
        dc = cfg_lib.DataConfiguration.from_dict(
            {"batch_size": 4, "shuffle": True, "shuffle_chunk": 8})
        assert dc.shuffle_chunk == 8
        assert dc.to_dict()["shuffle_chunk"] == 8
        # default stays the reference's exact uniform shuffle and is not
        # serialized (round-trip stability of existing configs)
        dc0 = cfg_lib.DataConfiguration.from_dict({"batch_size": 4})
        assert dc0.shuffle_chunk == 0
        assert "shuffle_chunk" not in dc0.to_dict()

    def test_prefetch_preserves_order(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        idx = indexing.all_indices(ds, indexing.SliceIndexing())
        ld = loader.SliceBatchLoader(ds, idx, batch_size=4)
        direct = [b["slice_index"] for b in ld]
        fetched = [np.asarray(b["slice_index"])
                   for b in loader.prefetch(iter(ld), device_put=True)]
        for a, b in zip(direct, fetched):
            np.testing.assert_array_equal(a, b)


class TestAssembler:
    def test_volume_assembly_and_readiness(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        asm = assembler.SubjectAssembler(ds, entries=("probabilities",))
        # feed slices of subjects 0 and 1 interleaved, batch of 4
        probs = np.arange(8 * 6 * 8).reshape(8, 6, 8).astype(np.float32)
        asm.add_batch({"probabilities": probs[:4]},
                      subject_indices=[0, 0, 1, 1], slice_indices=[0, 1, 0, 1])
        assert asm.subjects_ready() == []
        asm.add_batch({"probabilities": probs[4:]},
                      subject_indices=[0, 0, 1, 1], slice_indices=[2, 3, 2, 3])
        ready = asm.subjects_ready()
        assert set(ready) == {0, 1}
        vol = asm.get_assembled_subject(0)["probabilities"]
        assert vol.shape == (4, 6, 8)
        np.testing.assert_array_equal(vol[2], probs[4])

    def test_padding_ignored(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        asm = assembler.SubjectAssembler(ds, entries=("probabilities",))
        probs = np.ones((4, 6, 8), np.float32)
        asm.add_batch({"probabilities": probs}, subject_indices=[0, 0, 0, 0],
                      slice_indices=[0, 1, 2, 2], valid=np.array([1, 1, 1, 0.]))
        assert asm.subjects_ready() == []
        asm.add_batch({"probabilities": probs}, subject_indices=[0, 2, 2, 2],
                      slice_indices=[3, 0, 1, 2], valid=np.array([1, 1, 1, 1.]))
        assert asm.subjects_ready() == [0]

    def test_2d_assembler(self, tmp_path):
        path = _make_store(str(tmp_path / "ds.h5"))
        ds = h5.SubjectDataset(path)
        asm = assembler.Subject2dAssembler(ds, entries=("probabilities",))
        asm.add_batch({"probabilities": np.zeros((2, 6, 8))},
                      subject_indices=[0, 1])
        assert asm.subjects_ready() == [0, 1]
        assert asm.get_assembled_subject(1)["probabilities"].shape == (6, 8)
