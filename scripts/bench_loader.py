"""Host-loader microbench: serial vs reader-pool (P4) batch rates.

Builds a synthetic BraTS-slice-sized H5 store and measures SliceBatchLoader
throughput for num_workers in {0, 2, 4, 8}. Prints one JSON line per setting.
The pool overlaps H5 decode + transform numpy work across the batch; batches
are bit-identical to serial (tests/test_round2_fixes.py::TestReaderPool).

Measured on this image (page-cached store): ~33 batches/s at every worker
count — h5py's global lock serializes raw reads, so the pool only pays off
when per-item transform work dominates. At batch 32x240x240x4 that is a
~60 Mvox/s host feed vs the ~5.6 Mvox/s device pipeline: the training/test
loops are compute-bound, not input-bound, with an order of magnitude of
headroom.
"""
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402

from rcu_tpu.data import h5 as h5_lib  # noqa: E402
from rcu_tpu.data.loader import SliceBatchLoader  # noqa: E402
from rcu_tpu.data.nifti import ImageProperties  # noqa: E402

SUBJECTS, SLICES, H, W, C = 8, 32, 240, 240, 4
BATCH = 32


def build_store(path):
    rng = np.random.RandomState(0)
    with h5_lib.DatasetWriter(path) as writer:
        for i in range(SUBJECTS):
            writer.add_subject(
                f"s{i:02d}",
                {"images": rng.rand(SLICES, H, W, C).astype(np.float32),
                 "labels": (rng.rand(SLICES, H, W) > 0.5).astype(np.uint8)},
                props=ImageProperties(size=(W, H, SLICES)))
    return path


def main():
    with tempfile.TemporaryDirectory() as tmp:
        store = build_store(os.path.join(tmp, "bench.h5"))
        dataset = h5_lib.SubjectDataset(store)
        items = [(s, z) for s in range(SUBJECTS) for z in range(SLICES)]
        for workers in (0, 2, 4, 8):
            loader = SliceBatchLoader(dataset, items, batch_size=BATCH,
                                      num_workers=workers)
            list(loader)  # warm page cache / pool
            t0 = time.perf_counter()
            n = sum(1 for _ in loader)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "loader_batches_per_sec",
                "num_workers": workers,
                "value": round(n / dt, 2),
                "batch": [BATCH, H, W, C],
            }))


if __name__ == "__main__":
    main()
