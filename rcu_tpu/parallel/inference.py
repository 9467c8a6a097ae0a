"""Sharded flagship pipeline: MC-dropout inference + fused calibration eval
over a device mesh.

This is the multi-chip execution path for the north-star workload (T=20
MC-dropout over BraTS volumes followed by the full calibration/uncertainty
eval — BASELINE.json). The reference's only device parallelism was
single-host ``nn.DataParallel`` (common/trainloop/context.py:223-233); here
the whole pipeline is expressed as sharded XLA programs:

- **inference**: slice batches are sharded on their leading axis over the
  mesh's ``data`` axis while parameters are replicated — each chip runs the
  T-vmapped U-Net forwards on its batch shard, no communication needed until
  the host gathers per-slice outputs for assembly;
- **eval**: per-subject volumes are flattened to a voxel vector, padded to a
  multiple of the mesh size (with a zero ``weight`` so padding contributes
  nothing), and sharded over ``data``; the fused reduction kernels
  (:mod:`rcu_tpu.eval.kernels`) then compute per-chip partial sums and XLA
  inserts the ICI all-reduce for the scalar outputs automatically.

Numerical equality with the single-device path is asserted by
``tests/test_parallel.py`` on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rcu_tpu.eval import kernels
from rcu_tpu.ops import uncertainty as u_ops
from rcu_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated


def replicate_tree(tree, mesh):
    """Place a pytree (e.g. a TrainState) replicated on every mesh device."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def shard_voxels(mesh, arrays: dict, pad_values: dict = None):
    """Flatten volumes to voxel vectors, pad to a mesh-size multiple, shard.

    ``arrays`` maps names to same-voxel-count arrays; an array may carry a
    trailing class dim (e.g. two-class probabilities shaped (*vol, 2)) — it is
    flattened to (N, C) and sharded on axis 0 like the rest. Returns
    ``(sharded: dict, weight)`` where ``weight`` is the 1-D existence mask
    (0 over padding) to pass to the eval kernels.
    """
    sharding = batch_sharding(mesh)
    n_dev = mesh.devices.size
    sizes = set()
    flats = {}
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        if name.endswith("probabilities") and arr.ndim > 1 and arr.shape[-1] <= 2:
            flat = arr.reshape(-1, arr.shape[-1])
        else:
            flat = arr.reshape(-1)
        flats[name] = flat
        sizes.add(flat.shape[0])
    if len(sizes) != 1:
        raise ValueError(f"arrays disagree on voxel count: {sorted(sizes)}")
    n = sizes.pop()
    pad = (-n) % n_dev
    sharded = {}
    for name, flat in flats.items():
        if pad:
            fill = np.zeros((pad,) + flat.shape[1:], flat.dtype)
            if pad_values and name in pad_values:
                fill[...] = pad_values[name]
            flat = np.concatenate([flat, fill], axis=0)
        sharded[name] = jax.device_put(flat, sharding)
    weight = np.ones(n + pad, np.float32)
    weight[n:] = 0.0
    return sharded, jax.device_put(weight, sharding)


class ShardedSubjectEval:
    """Per-subject fused eval with volumes sharded over the mesh.

    Mirrors :mod:`rcu_tpu.eval.kernels` — same outputs, same semantics — but
    each call distributes the voxel reductions over every chip. All methods
    accept the original (unflattened) per-subject numpy/JAX arrays.
    """

    def __init__(self, mesh):
        self.mesh = mesh

    def ece_dice_confusion(self, probabilities, target, prediction, mask=None):
        arrays = {"probabilities": probabilities, "target": target,
                  "prediction": prediction}
        if mask is not None:
            arrays["mask"] = mask
        sh, weight = shard_voxels(self.mesh, arrays)
        return kernels.ece_dice_confusion(
            sh["probabilities"], sh["target"], sh["prediction"],
            sh.get("mask"), weight=weight)

    def calibration_bins(self, probabilities, target, prediction, mask=None):
        arrays = {"probabilities": probabilities, "target": target,
                  "prediction": prediction}
        if mask is not None:
            arrays["mask"] = mask
        sh, weight = shard_voxels(self.mesh, arrays)
        return kernels.calibration_bins(
            sh["probabilities"], sh["target"], sh["prediction"],
            sh.get("mask"), weight=weight)

    def correction_eval(self, prediction, target, uncertainty, thresholds):
        sh, weight = shard_voxels(self.mesh, {
            "prediction": prediction, "target": target,
            "uncertainty": uncertainty})
        return u_ops.correction_eval(sh["prediction"], sh["target"],
                                     sh["uncertainty"], thresholds,
                                     weight=weight)

    def min_max(self, x):
        # pad with the first element so padding can never win min or max
        first = float(np.asarray(x).reshape(-1)[0])
        sh, _ = shard_voxels(self.mesh, {"x": x}, pad_values={"x": first})
        return kernels.min_max(sh["x"])
