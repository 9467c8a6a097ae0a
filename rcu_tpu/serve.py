"""Production serving: a persistent fused-inference service + HTTP front.

No reference counterpart — the reference stack (bin-dl/bin-eval) is offline
scripts only. This is the deployment surface for the fused TPU programs:
load a checkpoint ONCE, keep shape-specialized compiled volume programs warm,
and answer requests with the standard artifacts, optionally scoring them
against a provided ground truth with the same fused eval pass the offline
pipeline uses (rcu_tpu.eval.pipeline).

Every checkpoint family is served (auto-detected / constructor-selected):
- **MC-dropout** (default): prediction / foreground probabilities /
  normalized entropy; scoring = masked ECE + 11-threshold correction
  (``mc=0`` serves the deterministic baseline protocol).
- **Aleatoric** (sigma-headed checkpoint; pass ``is_log_sigma``): adds the
  UNRESCALED predicted-class ``sigma`` map. The offline sigma protocol's
  global rescale is a RUN-level two-pass computation, so bounds ride the
  request: send ``sigma_min``/``sigma_max`` scalars to additionally get the
  folded ``confidence`` map, and to score (a scored aleatoric request
  without bounds is rejected — reference brats_test_aleatoric.py:66-69 +
  the eval stack's global minmax pass).
- **Ensemble** (``members=[model_dir, ...]``): stacked member params vmapped
  in one program (EP over a 2-D mesh's 'model' axis); artifacts are the
  member-mean probabilities + entropy (brats_test_ensemble.py:72-94).
- **Auxiliary feat.** (``segm_model_dir=...``; model_dir holds the PostNet):
  frozen segmenter + PostNet in one program; artifacts are the confidence
  map + the segmenter's prediction; scoring = the confidence protocol
  (subject rescale + fold, brats_test_auxiliary_feat.py:89-129).
- **Auxiliary segm.** (``aux_segm=True``): the error net over
  images+baseline; every request must carry the ``baseline`` prediction
  volume; artifacts are the confidence map + the baseline passthrough
  (brats_test_auxiliary_segm.py:68-120).

Wire protocol (stdlib-only on both ends; arrays ride npz):
  POST /v1/predict  body: ``.npz`` with ``images`` [Z,H,W,C] (or [H,W,C])
                    float32, optional ``target`` [Z,H,W] and — only together
                    with a target — ``mask`` [Z,H,W] (masks gate the eval
                    reductions, never the artifacts), optional
                    ``sigma_min``/``sigma_max`` scalars (aleatoric),
                    ``baseline`` [Z,H,W] (auxiliary-segm, required there)
                    and a ``per_image`` flag (native-2D scoring: the leading
                    axis holds independent images; returns per-image
                    ``ece``/``dice`` vectors + ``correction_*`` [K,11]
                    instead of pooled-subject scores and artifacts).
                    Returns ``.npz`` with the strategy's artifacts and, when
                    a target was sent, ``ece`` plus the per-threshold
                    ``correction_*`` vectors.
  GET  /v1/health   -> JSON {status, model_dir, strategy, mc, members,
                    batch_size, compiled_shapes}

Two multi-chip modes mirror the direct-eval driver's:
- latency (``mesh=...``): every request's volume shards ACROSS the mesh —
  fastest single answer; device work serializes through a lock (one
  program at a time spans all chips);
- throughput (``mesh=..., subject_parallel=True``): the model state
  replicates onto every mesh device and each request checks a whole device
  out of a pool — concurrent HTTP requests run on different chips with
  zero cross-chip traffic; server throughput scales ~linearly with the
  device count.

  Throughput mode deliberately maps ONE request to ONE device with no
  cross-request batching. The workload makes coalescing a loss: a request
  carries a whole subject whose slice axis already fills the conv batch
  (``batch_size`` 32 slices x the T-sample vmap — the measured
  memory-optimal MXU batch, scripts/perf_analysis.py), so merging two
  requests cannot raise per-chip utilization; it can only couple their
  latencies (the first-arriving request waits for a partner or a timeout)
  and force a second compiled shape per pairing. Requests short enough to
  underfill a device (tiny Z, ``per_image`` chunks) are latency-sensitive
  scoring calls where queueing for a batch partner is exactly the wrong
  trade. If a deployment ever serves floods of sub-batch-size requests,
  the right lever is the existing ``per_image`` protocol (the CLIENT
  stacks K independent images into one request) — batching at the wire
  format, not in the server's dispatch path.

The compiled program cache is a bounded LRU (``max_programs``): scored
requests key on their exact slice count, so a long-lived server facing
varied-Z volumes evicts cold programs instead of growing without bound.
"""
from __future__ import annotations

import collections
import io
import json
import logging
import threading
import zipfile

import jax
import numpy as np

from rcu_tpu.eval import pipeline as pl

DEFAULT_THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


class VolumeInferenceService:
    """Checkpoint(s) -> warm, shape-cached fused volume programs."""

    def __init__(self, model_dir: str, test_at="best", mc: int = 20,
                 batch_size: int = 32, mesh=None,
                 thresholds=DEFAULT_THRESHOLDS, seed: int = 0,
                 members: list = None, is_log_sigma: bool = None,
                 max_programs: int = 32, dtype: str = None,
                 segm_model_dir: str = None, aux_segm: bool = False,
                 subject_parallel: bool = False,
                 fast_decoder: bool = False,
                 fold_bn: bool = False,
                 quantize: bool = False):
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.eval.direct import _load_model_state
        self.model_dir = model_dir
        self.mc = int(mc)
        self.mesh = mesh
        self.thresholds = np.asarray(thresholds, np.float32)
        self.batch_size = int(batch_size)
        self.max_programs = int(max_programs)
        if mesh is not None and not subject_parallel:
            # latency mode shards the slice-batch axis over the mesh; the
            # throughput mode below runs whole requests on single devices
            from rcu_tpu.parallel.mesh import pad_batch_size_to_mesh
            self.batch_size = pad_batch_size_to_mesh(self.batch_size, mesh)
        # the init-probe spatial shape is irrelevant for conv params, but the
        # channel count must match the checkpoint — read it from model.json
        model_node, _ = ckpt_lib.load_model_parameters(
            ckpt_lib.ModelFiles.from_model_dir(model_dir))
        self.in_channels = int(model_node.params.get("in_channels", 4))
        probe = (1, 16, 16, self.in_channels)
        self.model, params, batch_stats = _load_model_state(
            model_dir, test_at, probe, dtype=dtype,
            fast_decoder=fast_decoder, fold_bn=fold_bn)
        self.members = list(members or [])
        self.segm_model = None
        member_sharded = False
        if sum(map(bool, (self.members, segm_model_dir, aux_segm))) > 1:
            raise ValueError("members, segm_model_dir and aux_segm select "
                             "mutually exclusive serving strategies")
        if self.members:
            from rcu_tpu.parallel.ensemble import stack_states
            self.strategy = "ensemble"
            stacks = [(params, batch_stats)]
            for member_dir in self.members:
                _, p, bs = _load_model_state(member_dir, test_at, probe,
                                             dtype=dtype,
                                             fast_decoder=fast_decoder,
                                             fold_bn=fold_bn)
                stacks.append((p, bs))
            state = (stack_states([s[0] for s in stacks]),
                     stack_states([s[1] for s in stacks]))
            member_sharded = True
        elif segm_model_dir:
            # auxiliary-feat: model_dir holds the PostNet, segm_model_dir
            # the frozen segmenter whose features feed it
            self.strategy = "auxiliary_feat"
            self.segm_model, segm_params, segm_stats = _load_model_state(
                segm_model_dir, test_at, probe, provide_features=True,
                dtype=dtype, fast_decoder=fast_decoder, fold_bn=fold_bn)
            self.in_channels = int(getattr(self.segm_model, "in_channels",
                                           self.in_channels))
            state = (segm_params, segm_stats, params, batch_stats)
        elif aux_segm:
            self.strategy = "auxiliary_segm"
            # the error net consumes images + the baseline channel; clients
            # send the raw image channels and the baseline separately
            self.in_channels = max(1, self.in_channels - 1)
            state = (params, batch_stats)
        elif getattr(self.model, "sigma_out", False):
            if is_log_sigma is None:
                raise ValueError(
                    f"{model_dir} is a sigma-headed (aleatoric) checkpoint: "
                    "pass is_log_sigma explicitly (it is a training-config "
                    "property the checkpoint cannot carry)")
            self.strategy = "aleatoric"
            state = (params, batch_stats)
        else:
            self.strategy = "mc"
            state = (params, batch_stats)
        self.is_log_sigma = bool(is_log_sigma) if is_log_sigma is not None \
            else None
        if fold_bn and self.strategy == "mc" and self.mc > 0:
            # same scope as evaluate_direct(fold_bn=True): the load-time BN
            # fold does not commute with active MC dropout
            raise ValueError(
                "fold_bn covers the deterministic single-forward serving "
                "strategies (mc=0/ensemble/aleatoric/auxiliary_*); the "
                "mc protocol samples dropout, which the BN fold cannot "
                "commute with")
        self._quantize = bool(quantize)
        self._quant_ready = not self._quantize
        self._calib_state = None
        if self._quantize:
            # same scope as evaluate_direct(quantize=True): the int8 trunk
            # covers the mc (incl. mc=0 deterministic) and ensemble
            # protocols; sigma/confidence heads keep the f32/bf16 paths
            if self.strategy not in ("mc", "ensemble"):
                raise ValueError(
                    "quantize=True covers the mc/deterministic/ensemble "
                    f"serving strategies; '{self.strategy}' keeps the "
                    "f32/bf16 paths")
            # pre-placement state: calibration applies the PLAIN model once
            # on the first request's slices (ops/quant.py); arrays are
            # immutable so this is a reference, not a copy
            self._calib_state = state
        self.subject_parallel = bool(subject_parallel and mesh is not None)
        if self.subject_parallel:
            # throughput mode: every mesh device holds a full state replica
            # and whole requests check a device out of the pool (the serving
            # twin of evaluate_direct's subject_parallel mode); programs
            # compile single-device
            import queue
            devices = list(mesh.devices.flat)
            self._device_state = {
                d: tuple(jax.device_put(t, d) for t in state)
                for d in devices}
            self._device_pool = queue.Queue()
            for d in devices:
                self._device_pool.put(d)
            self.mesh = None
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from rcu_tpu.parallel.ensemble import MODEL_AXIS
            rep = NamedSharding(mesh, P())
            member = NamedSharding(mesh, P(MODEL_AXIS)) \
                if (member_sharded and MODEL_AXIS in mesh.axis_names) else rep
            state = tuple(jax.device_put(t, member if member_sharded else rep)
                          for t in state)
        self.state = state
        self._programs = collections.OrderedDict()  # bounded LRU
        self._rng = jax.random.PRNGKey(seed)
        self._requests = 0
        self._lock = threading.Lock()        # latency-mode device work
        self._cache_lock = threading.Lock()  # program LRU + request counter

    # ------------------------------------------------------------- programs
    def _make_image_program(self):
        """The chunked per-image eval program (native-2D protocol): K images
        per dispatch, every image's OWN eval reductions vmapped."""
        if self.strategy == "ensemble":
            return pl.make_image_batch_ensemble_eval_fn(self.model,
                                                        mesh=self.mesh)
        if self.strategy == "auxiliary_feat":
            return pl.make_image_batch_aux_feat_eval_fn(
                self.segm_model, self.model, mesh=self.mesh)
        if self.strategy == "auxiliary_segm":
            return pl.make_image_batch_aux_segm_eval_fn(self.model,
                                                        mesh=self.mesh)
        if self.strategy == "aleatoric":
            return pl.make_image_batch_aleatoric_eval_fn(
                self.model, self.is_log_sigma, mesh=self.mesh)
        return pl.make_image_batch_mc_eval_fn(self.model, self.mc,
                                              mesh=self.mesh)

    def _make_program(self, vol_slices: int, with_eval: bool, batch: int):
        if with_eval == "per_image":
            return self._make_image_program()
        if self.strategy == "ensemble":
            factory = pl.make_volume_ensemble_eval_fn if with_eval \
                else pl.make_volume_ensemble_fn
            kw = {"artifacts": True} if with_eval else {}
            return factory(self.model, batch, vol_slices, mesh=self.mesh,
                           **kw)
        if self.strategy == "auxiliary_feat":
            if with_eval:
                return pl.make_volume_aux_feat_eval_fn(
                    self.segm_model, self.model, batch, vol_slices,
                    mesh=self.mesh, artifacts=True)
            return pl.make_volume_aux_feat_fn(self.segm_model, self.model,
                                              batch, vol_slices,
                                              mesh=self.mesh)
        if self.strategy == "auxiliary_segm":
            if with_eval:
                return pl.make_volume_aux_segm_eval_fn(
                    self.model, batch, vol_slices, mesh=self.mesh,
                    artifacts=True)
            return pl.make_volume_aux_segm_fn(self.model, batch, vol_slices,
                                              mesh=self.mesh)
        if self.strategy == "aleatoric":
            if with_eval:
                return pl.make_volume_aleatoric_eval_fn(
                    self.model, batch, vol_slices, self.is_log_sigma,
                    mesh=self.mesh, artifacts=True)
            return pl.make_volume_aleatoric_fn(
                self.model, batch, vol_slices, self.is_log_sigma,
                mesh=self.mesh)
        factory = pl.make_volume_mc_eval_fn if with_eval \
            else pl.make_volume_mc_fn
        return factory(self.model, self.mc, batch, vol_slices,
                       mesh=self.mesh)

    def _program(self, vol_slices: int, with_eval: bool, batch: int):
        key = (vol_slices, with_eval, batch)
        with self._cache_lock:  # throughput mode races concurrent requests
            fn = self._programs.get(key)
            if fn is not None:
                self._programs.move_to_end(key)
                return fn
            fn = self._make_program(vol_slices, with_eval, batch)
            self._programs[key] = fn
            while len(self._programs) > self.max_programs:
                evicted, _ = self._programs.popitem(last=False)
                logging.info("serve: evicted compiled program %s "
                             "(cache cap %d)", evicted, self.max_programs)
            return fn

    def _effective_batch(self, nz: int) -> int:
        """Shrink the slice batch to the volume: a 1-slice (native-2D)
        request must not be padded out to a 32-slice batch of zeros. Small
        volumes bucket to the next power of two so unscored programs stay at
        ~log2(batch_size) cache entries (scored programs key on their exact
        slice count and rely on the LRU cap instead — remote compiles cost
        20-300s each)."""
        batch = min(self.batch_size, 1 << max(0, nz - 1).bit_length())
        if self.mesh is not None:
            from rcu_tpu.parallel.mesh import pad_batch_size_to_mesh
            batch = pad_batch_size_to_mesh(batch, self.mesh)
        return batch

    def compiled_shapes(self):
        # snapshot: a concurrent predict() may be inserting a new program
        def label(nz, ev, batch):
            if ev == "per_image":
                return "per-image"  # one jit object; retraces per K inside
            return f"{nz}-slices-b{batch}{'-scored' if ev else ''}"
        return sorted(label(*key) for key in list(self._programs))

    # -------------------------------------------------------------- predict
    @property
    def pool_size(self) -> int:
        """Device replicas answering requests (1 outside throughput mode) —
        prewarm loops compile once per pool device."""
        return len(self._device_state) if self.subject_parallel else 1

    def _dispatch_pooled(self, run):
        """Run ``run(state, put)`` on a checked-out pool device (throughput
        mode; the committed device_put pins the program to that chip) or
        under the latency lock on the shared state."""
        if self.subject_parallel:
            dev = self._device_pool.get()
            try:
                return run(self._device_state[dev],
                           lambda a: jax.device_put(a, dev))
            finally:
                self._device_pool.put(dev)
        with self._lock:
            return run(self.state, lambda a: a)

    def _next_rng(self):
        with self._cache_lock:
            self._requests += 1
            request_index = self._requests
        return jax.random.fold_in(self._rng, request_index)

    def _ensure_quant_calibrated(self, volume: np.ndarray):
        """First-request int8 calibration (quantize=True services).

        A server has no dataset at construction time, so the CENTER slices
        of the first request are the calibration batch — the serving analog
        of eval/direct._calibrated_quant_model's center-slice rule (edge
        slices are often empty). The quantized model swaps in before any
        program is built (the LRU is empty until the first request), so
        every compiled program runs the int8 trunk. Ensembles union-
        calibrate per member (deterministic forward, scales merge by max);
        MC calibrates under one dropout sample unless mc=0."""
        if self._quant_ready:
            return
        with self._cache_lock:
            if self._quant_ready:
                return
            from rcu_tpu.ops import quant as quant_ops
            n = max(1, min(self.batch_size, len(volume)))
            lo = max(0, (len(volume) - n) // 2)
            batch = np.asarray(volume[lo:lo + n], np.float32)
            state = self._calib_state
            if self.strategy == "ensemble":
                n_members = jax.tree_util.tree_leaves(state[0])[0].shape[0]
                scales: dict = {}
                for m in range(n_members):
                    member = jax.tree_util.tree_map(lambda x: x[m], state)
                    member_scales = quant_ops.calibrate_scales(
                        self.model,
                        {"params": member[0], "batch_stats": member[1]},
                        [batch], mc_dropout=False)
                    for key, val in member_scales.items():
                        scales[key] = max(scales.get(key, 0.0), val)
            else:
                scales = quant_ops.calibrate_scales(
                    self.model, {"params": state[0], "batch_stats": state[1]},
                    [batch], rng=self._rng, mc_dropout=self.mc > 0)
            # measured production default: keep the finest level(s) in the
            # compute dtype (int8 loses to bf16 there — ops/quant.py)
            skip = quant_ops.clamp_skip_levels(
                self.model, quant_ops.DEFAULT_SKIP_LEVELS)
            self.model = self.model.copy(quant_scales=scales,
                                         quant_skip_levels=skip)
            self._calib_state = None
            self._quant_ready = True
            logging.info("serve: int8 calibrated %d conv sites from the "
                         "first request (%d items; %d finest levels kept "
                         "in the compute dtype)", len(scales), n, skip)

    @staticmethod
    def _binarized(arr, want, name):
        arr = (np.asarray(arr) > 0.5).astype(np.uint8)
        if arr.ndim == 2:
            arr = arr[None]
        if arr.shape != want:
            raise ValueError(f"{name} shape {arr.shape} does not match the "
                             f"request's {want}")
        return arr

    @classmethod
    def _scored_arrays(cls, target, mask, want):
        target = cls._binarized(target, want, "target")
        m = np.ones(want, bool) if mask is None \
            else np.asarray(mask).reshape(want) > 0
        return target, m

    def predict(self, images: np.ndarray, target: np.ndarray = None,
                mask: np.ndarray = None, sigma_bounds=None,
                baseline: np.ndarray = None,
                per_image: bool = False) -> dict:
        """One volume in, the strategy's serving artifacts out (numpy).
        Thread-safe.

        ``per_image=True`` switches scoring to the native-2D protocol: the
        leading axis holds K INDEPENDENT images and every image gets its own
        eval row (``ece``/``dice`` vectors, ``correction_*`` [K, 11]) from
        one chunked dispatch — scores only; fetch per-voxel artifacts with a
        plain request."""
        if self.strategy == "auxiliary_segm" and baseline is None:
            raise ValueError(
                "an auxiliary-segm service scores a BASELINE segmentation: "
                "send its prediction volume as 'baseline'")
        if baseline is not None and self.strategy != "auxiliary_segm":
            raise ValueError("'baseline' only applies to an auxiliary-segm "
                             f"service; this server runs '{self.strategy}'")
        if target is None and mask is not None:
            # checked before any padding/device transfer: a rejected request
            # must not ship a 30+ MB volume across the tunnel first
            raise ValueError(
                "a mask without a target has no effect: masks only gate the "
                "eval reductions (ece), never the prediction artifacts — "
                "send a target to score, or drop the mask")
        if sigma_bounds is not None:
            if self.strategy != "aleatoric":
                raise ValueError("sigma_min/sigma_max only apply to an "
                                 "aleatoric (sigma-headed) service; this "
                                 f"server runs '{self.strategy}'")
            smin, smax = (float(sigma_bounds[0]), float(sigma_bounds[1]))
            if not smax > smin:
                raise ValueError(f"degenerate sigma bounds [{smin}, {smax}]")
            sigma_bounds = (np.float32(smin), np.float32(smax))
        if target is not None and self.strategy == "aleatoric" \
                and sigma_bounds is None:
            raise ValueError(
                "scoring an aleatoric request needs the run-level global "
                "sigma bounds: send sigma_min/sigma_max (the offline "
                "protocol's minmax pass over the whole run)")
        if per_image:
            return self._predict_per_image(images, target, mask,
                                           sigma_bounds, baseline)
        volume = np.asarray(images, np.float32)
        if volume.ndim == 3:          # single image -> one-slice volume
            volume = volume[None]
        if volume.ndim != 4:
            raise ValueError(f"images must be [Z,H,W,C] or [H,W,C], got "
                             f"shape {volume.shape}")
        if volume.size == 0:
            raise ValueError(f"images array is empty: shape {volume.shape}")
        if volume.shape[-1] != self.in_channels:
            # client error, not a server fault: fail before the jitted
            # forward turns it into an opaque 500
            raise ValueError(
                f"images have {volume.shape[-1]} channels but the served "
                f"checkpoint expects {self.in_channels}")
        self._ensure_quant_calibrated(volume)
        nz = volume.shape[0]
        batch = self._effective_batch(nz)
        pad = (-nz) % batch

        def _batched(arr):
            if pad:
                arr = np.concatenate(
                    [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
            arr = arr.reshape((-1, batch) + arr.shape[1:])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from rcu_tpu.parallel.mesh import DATA_AXIS
                arr = jax.device_put(
                    arr, NamedSharding(self.mesh, P(None, DATA_AXIS)))
            return arr

        batched = _batched(volume)
        want = (nz,) + volume.shape[1:3]
        data_args = (batched,)
        if baseline is not None:
            baseline = self._binarized(baseline, want, "baseline")
            data_args = (batched, _batched(baseline))

        m = None
        if target is not None:
            target, m = self._scored_arrays(target, mask, want)

        rng = self._next_rng()

        def dispatch(state, put):
            if target is None:
                # key the program on the PADDED slice count: near-identical
                # volumes (e.g. 150-160 slices at batch 32) then share one
                # compiled program; the padded tail is trimmed host-side
                fn = self._program(batched.shape[0] * batch,
                                   with_eval=False, batch=batch)
                args = state + tuple(put(a) for a in data_args)
                return fn(*args, put(rng)) if self.strategy == "mc" \
                    else fn(*args)
            fn = self._program(nz, with_eval=True, batch=batch)
            args = state + tuple(put(a) for a in data_args) \
                + (target, m, self.thresholds)
            if self.strategy == "mc":
                return fn(*args, put(rng))
            if self.strategy == "aleatoric":
                return fn(*args, *sigma_bounds)
            return fn(*args)

        out = self._dispatch_pooled(dispatch)
        return self._host_result(out, nz, target is not None, sigma_bounds)

    def _predict_per_image(self, images, target, mask, sigma_bounds,
                           baseline):
        """Chunked per-image scoring (the native-2D eval protocol) — one
        dispatch for K independent images; rows for padded tail images
        (latency-mesh divisibility) are dropped host-side."""
        if target is None:
            raise ValueError(
                "per_image requests are scored-only: send targets [K,H,W] "
                "(use a plain request for the per-voxel artifacts)")
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[None]
        if images.ndim != 4:
            raise ValueError(f"images must be [K,H,W,C] or [H,W,C], got "
                             f"shape {images.shape}")
        if images.size == 0:
            raise ValueError(f"images array is empty: shape {images.shape}")
        if images.shape[-1] != self.in_channels:
            raise ValueError(
                f"images have {images.shape[-1]} channels but the served "
                f"checkpoint expects {self.in_channels}")
        self._ensure_quant_calibrated(images)
        k = images.shape[0]
        want = (k,) + images.shape[1:3]
        target, m = self._scored_arrays(target, mask, want)
        if baseline is not None:
            baseline = self._binarized(baseline, want, "baseline")

        pad = 0
        if self.mesh is not None:
            from rcu_tpu.parallel.mesh import DATA_AXIS
            pad = (-k) % dict(self.mesh.shape).get(DATA_AXIS, 1)

        def _pad(arr, fill=0):
            if pad:
                filler = np.full((pad,) + arr.shape[1:], fill, arr.dtype)
                arr = np.concatenate([arr, filler])
            return arr

        data = (_pad(images),) \
            + ((_pad(baseline),) if baseline is not None else ()) \
            + (_pad(target), _pad(m, True), self.thresholds)

        rng = self._next_rng()
        fn = self._program(0, "per_image", 0)

        def run(state, put):
            args = state + tuple(put(a) for a in data)
            if self.strategy == "mc":
                return fn(*args, put(rng))
            if self.strategy == "aleatoric":
                return fn(*args, *sigma_bounds)
            return fn(*args)

        out = jax.device_get(self._dispatch_pooled(run))  # one coalesced D2H
        result = {"ece": np.asarray(out["ece"], np.float32)[:k],
                  "dice": np.asarray(out["dice"], np.float32)[:k]}
        for key, value in out["correction"].items():
            result[f"correction_{key}"] = np.asarray(value)[:k]
        return result

    def _host_result(self, out, nz, scored, sigma_bounds):
        # ONE coalesced D2H for the whole output tree: per-leaf np.asarray
        # costs a round trip per artifact (~10 per scored request) over a
        # remote-TPU link (same convention as eval/direct.py's fetch)
        out = jax.device_get(out)
        if self.strategy in ("auxiliary_feat", "auxiliary_segm"):
            result = {
                "prediction": np.asarray(out["prediction"])[:nz]
                .astype(np.uint8),
                "confidence": np.asarray(out["confidence"], np.float32)[:nz],
            }
        elif self.strategy == "aleatoric":
            prediction = np.asarray(out["prediction"])[:nz]
            sigma = np.asarray(out["sigma"], np.float32)[:nz]
            if scored:
                confidence = np.asarray(out["confidence"], np.float32)[:nz]
            else:
                confidence = None
                if sigma_bounds is not None:
                    # fold host-side: keeps the unscored program cache free
                    # of a bounds-specialized variant (elementwise, cheap)
                    from rcu_tpu.ops.prepare import fold_sigma_host
                    confidence = fold_sigma_host(sigma, prediction,
                                                 *sigma_bounds)
            result = {"prediction": prediction.astype(np.uint8),
                      "sigma": sigma}
            if not scored:
                result["probabilities"] = np.asarray(out["fg"],
                                                     np.float32)[:nz]
            if confidence is not None:
                result["confidence"] = confidence
        else:
            fg = np.asarray(out["fg"], np.float32)[:nz]
            result = {
                "prediction": (fg > 0.5).astype(np.uint8),
                "probabilities": fg,
                "entropy": np.asarray(out["entropy"], np.float32)[:nz],
            }
        if scored:
            result["ece"] = np.float32(out["ece"])
            for key, value in out["correction"].items():
                result[f"correction_{key}"] = np.asarray(value)
        return result


def _npz_bytes(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def make_http_server(service: VolumeInferenceService, host: str = "0.0.0.0",
                     port: int = 8475):
    """A ready-to-`serve_forever()` ThreadingHTTPServer around the service."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logging.info("serve: " + fmt, *args)

        def _send(self, code, body: bytes, content_type: str):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/v1/health":
                return self._send(404, b'{"error": "not found"}',
                                  "application/json")
            body = json.dumps({
                "status": "ok",
                "model_dir": service.model_dir,
                "strategy": service.strategy,
                "mc": service.mc,
                # model_dir's own state is stacked as member 0
                "members": (len(service.members) + 1
                            if service.members else 0),
                "batch_size": service.batch_size,
                "compiled_shapes": service.compiled_shapes(),
            }).encode()
            self._send(200, body, "application/json")

        def do_POST(self):
            if self.path != "/v1/predict":
                return self._send(404, b'{"error": "not found"}',
                                  "application/json")
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = np.load(io.BytesIO(self.rfile.read(length)),
                                  allow_pickle=False)
                if "images" not in payload:
                    raise ValueError('request .npz is missing "images"')
                sigma_bounds = None
                if "sigma_min" in payload or "sigma_max" in payload:
                    if not ("sigma_min" in payload
                            and "sigma_max" in payload):
                        raise ValueError("sigma_min and sigma_max must be "
                                         "sent together")
                    sigma_bounds = (float(payload["sigma_min"]),
                                    float(payload["sigma_max"]))
                result = service.predict(
                    payload["images"],
                    target=payload["target"] if "target" in payload else None,
                    mask=payload["mask"] if "mask" in payload else None,
                    sigma_bounds=sigma_bounds,
                    baseline=payload["baseline"]
                    if "baseline" in payload else None,
                    per_image=bool(payload["per_image"])
                    if "per_image" in payload else False)
            except (ValueError, KeyError, OSError,
                    zipfile.BadZipFile) as exc:
                # malformed payloads / bad shapes -> the client's fault
                logging.exception("serve: bad request")
                return self._send(400, json.dumps(
                    {"error": str(exc)}).encode(), "application/json")
            except Exception as exc:
                # device OOM, compile/tunnel failures, bugs -> server fault,
                # so retry logic and monitoring see a 5xx, not a 400
                logging.exception("serve: internal failure")
                return self._send(500, json.dumps(
                    {"error": str(exc)}).encode(), "application/json")
            self._send(200, _npz_bytes(result), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)
