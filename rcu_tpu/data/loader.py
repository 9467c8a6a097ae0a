"""Host batch loader with static shapes and double-buffered device prefetch.

Replaces the reference's ``pymia DataLoader(num_workers)`` + ``CollateDict``
(``common/trainloop/data.py:58-66``) with a TPU-idiomatic feed:

- batches are dicts of numpy arrays with **static shapes**: the ragged last
  batch is padded to ``batch_size`` and carries a float ``valid`` mask so the
  jitted step can ignore padding (XLA recompiles on shape change — padding
  avoids that);
- ``prefetch_to_device`` overlays host H5 reads with device compute by keeping
  ``size`` batches in flight (``jax.device_put`` is async), the structural
  equivalent of the reference's worker subprocesses (P4 in SURVEY §2.7).
"""
from __future__ import annotations

import queue
import threading
import typing

import numpy as np

import jax

from rcu_tpu.data.h5 import SubjectDataset


class SliceBatchLoader:
    """Yields `{'images','labels',...,'subject_index','slice_index','valid'}`."""

    def __init__(self, dataset: SubjectDataset, indices: list, batch_size: int,
                 categories=("images", "labels"), shuffle: bool = False,
                 seed: int = 0, drop_remainder: bool = False,
                 transform=None, indexing=None, num_workers: int = 0,
                 shard: typing.Optional[typing.Tuple[int, int]] = None,
                 shuffle_chunk: int = 0):
        self.dataset = dataset
        self.indexing = indexing  # owns index->array extraction when given
        self.indices = list(indices)
        self.batch_size = batch_size
        self.categories = tuple(categories)
        self.shuffle = shuffle
        if shuffle_chunk < 0:
            raise ValueError(f"shuffle_chunk must be >= 0, got {shuffle_chunk}")
        # chunked shuffle (opt-in): the epoch order is built from shuffled
        # CHUNKS of `shuffle_chunk` consecutive indices instead of a uniform
        # permutation. Each chunk stays in ascending order, so the direct
        # collate's run-coalescer reads one HDF5 range per chunk — shuffled
        # epochs keep near-unshuffled read speed (scripts/bench_loader.py:
        # 158-168 Mvox/s vs 104 exact) at chunk-granular randomness.
        # The randomness cost is MEASURED (scripts/shuffle_ab.py, 20-epoch
        # convergence A/B on the synthetic task, same seeds): final
        # validation dice 0.999 exact vs 0.997 chunk=8 vs 0.995 chunk=32
        # (delta <= 0.004), trajectories tracking within noise, while mean
        # within-batch subject diversity drops 0.93 -> 0.46 / 0.31 and the
        # normalized item displacement stays ~1.0 (uniform-shuffle-like
        # global mixing; only short-range order survives inside a chunk).
        # 0/1 = exact uniform shuffle, the default; see README "8-chip
        # training feed" for the production recipe.
        self.shuffle_chunk = int(shuffle_chunk)
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.transform = transform
        self.num_workers = int(num_workers or 0)
        if shard is not None:
            shard_id, n_shards = shard
            if not 0 <= shard_id < n_shards:
                raise ValueError(f"shard {shard} must satisfy "
                                 "0 <= shard_id < n_shards")
        self.shard = shard
        self._pool = None  # lazily created, shared across epochs
        self._epoch = 0

    def peek_item_shapes(self) -> dict:
        """Per-category shapes of ONE decoded (post-transform) item — for
        model-init probes, without paying a full batch of H5 reads."""
        probe = SliceBatchLoader(self.dataset, self.indices[:1], batch_size=1,
                                 categories=self.categories,
                                 transform=self.transform,
                                 indexing=self.indexing)
        batch = next(iter(probe))
        return {c: batch[c].shape[1:] for c in self.categories}

    def _reader_pool(self):
        """P4 host read parallelism (reference DataLoader(num_workers),
        common/trainloop/data.py:65-66) as a persistent thread pool: threads
        overlap H5 decode + transform numpy work across the batch. Order is
        preserved (Executor.map), so batches are bit-identical to serial.

        num_workers mapping: the reference's ``num_workers: 1`` (one
        background worker process) corresponds to the prefetch thread that
        always wraps this loader; pool threads only engage for >= 2. Measured
        on this image the pool is neutral (h5py's global lock serializes raw
        reads; scripts/bench_loader.py) — it pays off when per-item transform
        work dominates."""
        if self._pool is None and self.num_workers > 1:
            import concurrent.futures
            self._pool = concurrent.futures.ThreadPoolExecutor(
                self.num_workers, thread_name_prefix="loader")
        return self._pool

    def __len__(self):
        n = len(self._epoch_order())
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self, order):
        """Apply the per-host shard to an (epoch-shuffled) index order.

        Multi-host data parallelism (SURVEY §2.7 P4 scaled out): each host
        constructs its loader with ``shard=(host_id, n_hosts)`` and feeds
        only its local devices. Shards stride the epoch order (so a global
        shuffle still mixes subjects across hosts every epoch) and truncate
        to the common length — every host sees the SAME number of batches
        per epoch, keeping lockstep collectives from deadlocking on a
        ragged tail."""
        if self.shard is None:
            return order
        shard_id, n_shards = self.shard
        n_per = len(order) // n_shards
        return order[shard_id::n_shards][:n_per]

    def set_epoch(self, epoch: int):
        """Reseed shuffling per epoch (reference reseeds seed+epoch, loops.py:149-151)."""
        self._epoch = epoch

    def _epoch_order(self):
        """This epoch's item order: shuffle (uniform or chunked) + shard."""
        order = np.arange(len(self.indices))
        c = self.shuffle_chunk
        if self.shuffle and c > 1:
            rng = np.random.RandomState(self.seed + self._epoch)
            # per-epoch random chunk-origin offset: rotates the chunk
            # boundaries AND which (partial-chunk) items fall outside the
            # full chunks, so no fixed set of items is systematically
            # under-sampled across epochs. Deterministic in (seed, epoch),
            # hence identical on every host.
            off = int(rng.randint(c))
            head, body = order[:off], order[off:]
            n_full = len(body) // c
            chunks = [body[k * c:(k + 1) * c] for k in range(n_full)]
            tail = body[n_full * c:]
            if self.shard is None:
                # partial chunks (head/tail, < c items each) still
                # participate: every item is yielded every epoch.
                chunks.extend(p for p in (head, tail) if len(p))
                if not chunks:
                    return order  # empty index list
                perm = rng.permutation(len(chunks))
                return np.concatenate([chunks[k] for k in perm])
            # shard at CHUNK granularity: striding rows (as the uniform path
            # does) would break every run the chunked order exists to keep.
            # Hosts take disjoint full chunks from the same shuffled chunk
            # order, truncated to a per-shard count computed from the
            # WORST-CASE offset (so every host runs the same number of
            # lockstep batches in EVERY epoch — TensorBoard global steps
            # and the fused-ensemble step count assume a constant length).
            # Per epoch this drops the partial head/tail chunks plus the
            # over-count whole chunks (up to ~n_shards*c + c items total) —
            # a bigger cut than the uniform path's up-to-n_shards-1, but
            # WHICH items are cut rotates with the per-epoch offset above.
            shard_id, n_shards = self.shard
            n_min_full = max(0, len(order) - (c - 1)) // c
            n_per = n_min_full // n_shards
            if n_per == 0 and len(order):
                raise ValueError(
                    f"chunked shuffle with shard={self.shard} needs at least "
                    f"{n_shards} full chunks at any epoch offset, got "
                    f"{n_min_full} ({len(order)} items / shuffle_chunk={c}); "
                    "reduce shuffle_chunk or disable chunked shuffle")
            perm = rng.permutation(n_full)
            mine = perm[shard_id::n_shards][:n_per]
            if n_per == 0:
                return order[:0]  # empty index list
            return np.concatenate([chunks[k] for k in mine])
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        return self._order(order)  # per-host shard of the epoch order

    def _read(self, subject_idx: int, slice_idx: int) -> dict:
        subject = self.dataset.subjects[subject_idx]
        out = {}
        for c in self.categories:
            if self.indexing is not None:
                out[c] = self.indexing.extract(self.dataset, subject,
                                               slice_idx, c)
            elif slice_idx < 0:
                out[c] = self.dataset.read_volume(subject, c)
            else:
                out[c] = self.dataset.read_slice(subject, slice_idx, c)
        if self.transform is not None:
            out = self.transform(out)
        return out

    def _collate_direct(self, chunk):
        """Zero-copy collate for the plain-slice path: run-coalesced HDF5
        ``read_direct`` straight into the batch array (no per-item array,
        no stack copy) — measured ~2x over the copying path on the BraTS
        slice workload (unshuffled ~175 Mvox/s single-core vs the copying
        path's ~84; uniform-shuffled ~100, back to ~160+ with the chunked
        shuffle); the lever that lifts the single-core host feed past the
        8-chip training demand (scripts/bench_loader.py). Engages when there is no transform and
        indexing is plain slices (production BraTS training: the
        torch-layout transforms are recognized no-ops and collapse to
        ``transform=None``). Returns None on any shape/dtype mismatch so
        ``__iter__`` falls back to the copying collate for that batch."""
        from rcu_tpu.data.indexing import SliceIndexing
        if self.transform is not None or not (
                self.indexing is None
                or isinstance(self.indexing, SliceIndexing)):
            return None
        first_s, first_z = self.indices[chunk[0]]
        if first_z < 0:
            return None  # whole-volume read: no row destination
        subj0 = self.dataset.subjects[first_s]
        # coalesce the batch into runs of consecutive slices of one subject
        # (one ranged read_direct per run — unshuffled epochs collapse to
        # 1-2 runs per batch, ~3x over per-row reads; a fully shuffled
        # batch degenerates to per-row runs on cached dataset handles)
        runs = []  # (subject_name, z_start, z_stop, dest_row_start)
        for row, i in enumerate(chunk):
            s, z = self.indices[i]
            if z < 0:
                return None
            name = self.dataset.subjects[s]
            if runs and runs[-1][0] == name and z == runs[-1][2]:
                runs[-1][2] = z + 1
            else:
                runs.append([name, z, z + 1, row])
        batch = {}
        for c in self.categories:
            shape = self.dataset.shape(subj0, c)
            # match read_slice's dtype exactly (bit-identical contract)
            batch[c] = np.empty((len(chunk),) + tuple(shape[1:]),
                                self.dataset.dtype(subj0, c))
            for name, z0, z1, row0 in runs:
                if not self.dataset.read_slices_into(
                        name, z0, z1, c, batch[c], row0):
                    return None
        return batch

    def __iter__(self):
        order = self._epoch_order()
        bs = self.batch_size
        for start in range(0, len(order), bs):
            chunk = order[start:start + bs]
            if len(chunk) < bs and self.drop_remainder:
                return
            batch = self._collate_direct(chunk)
            if batch is None:
                pool = self._reader_pool()
                if pool is not None:
                    items = list(pool.map(
                        lambda i: self._read(*self.indices[i]), chunk))
                else:
                    items = [self._read(*self.indices[i]) for i in chunk]
                batch = {c: np.stack([it[c] for it in items])
                         for c in self.categories}
            nb_valid = len(chunk)
            if nb_valid < bs:  # pad ragged tail to static shape
                pad = bs - nb_valid
                for c in batch:
                    batch[c] = np.concatenate(
                        [batch[c], np.repeat(batch[c][-1:], pad, axis=0)])
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
            batch["subject_index"] = np.asarray(
                [self.indices[i][0] for i in chunk], np.int32)
            batch["slice_index"] = np.asarray(
                [self.indices[i][1] for i in chunk], np.int32)
            batch["valid"] = (np.arange(bs) < nb_valid).astype(np.float32)
            yield batch


def prefetch(iterator, size: int = 2, device_put: bool = True, sharding=None):
    """Background-thread prefetch; optionally places batches on device.

    With a NamedSharding, batches land pre-sharded across the mesh (the
    multi-chip feed path). Exceptions in the worker propagate to the consumer.
    Abandoning the generator mid-iteration (consumer raised / broke out)
    releases the worker: puts poll a stop flag, so neither the thread nor its
    queued device batches outlive the loop that consumed them.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def offer(item) -> bool:
        """put() that gives up once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                if device_put:
                    item = jax.device_put(item, sharding) if sharding is not None \
                        else jax.device_put(item)
                if not offer(item):
                    return
            offer(_END)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            offer(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unpin any device batches parked in the queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
