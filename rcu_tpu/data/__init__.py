"""Data engine: NIfTI/H5 I/O, collectors, splits, indexing, loading, assembly."""
from rcu_tpu.data import assembler, collector, h5, indexing, loader, nifti, split, transforms  # noqa: F401
from rcu_tpu.data.nifti import ImageProperties  # noqa: F401
