"""rcu_tpu — a TPU-native (JAX/XLA/Pallas) uncertainty-estimation framework.

A from-scratch rebuild of the capabilities of the MICCAI-2019
"Assessing Reliability and Challenges of Uncertainty Estimations for Medical
Image Segmentation" codebase (alainjungo/reliability-challenges-uncertainty),
re-designed TPU-first:

- compute path: jitted/pjit-ed pure functions, vmapped MC/ensemble axes,
  fused on-device calibration reductions (optionally Pallas kernels);
- data path: host-side NIfTI/H5 I/O with double-buffered device prefetch;
- parallel path: ``jax.sharding.Mesh`` + NamedSharding data parallelism over
  ICI (the TPU-native replacement for the reference's ``nn.DataParallel``,
  reference ``common/trainloop/context.py:223-233``).

Layout (mirrors the reference's layer map, see SURVEY.md):
  ops/       pure JAX metrics, calibration, uncertainty decomposition, losses
  models/    flax U-Net + PostNet (reference ``common/model/``)
  data/      NIfTI/H5 IO, splits, indexing, loader, assembler (pymia replacement)
  engine/    config, train/test loops, checkpoints, hooks (``common/trainloop/``)
  parallel/  mesh + sharding (new first-class component, no reference counterpart)
  eval/      offline uncertainty evaluation engine (``bin-eval`` + ``rechun/eval``)
  analysis/  tables & figures (``bin-analysis`` + ``rechun/analysis``)
  utils/     ids, files, logging, labels, writer pool (``common/utils``)
"""

__version__ = "0.1.0"
