"""Direct one-pass test+eval: checkpoint -> per-volume fused MC inference +
calibration/uncertainty eval, with NO intermediate NIfTI artifacts.

The reference pipeline (and our contract-compatible one) stages through disk:
``*_test_*`` writes per-subject NIfTIs, then ``eval_uncertainty`` re-reads
them (bin-dl/brats_test_default.py -> bin-eval/eval_uncertainty.py). That
round-trip costs two gzip passes plus a full host decode per subject. This
module is the production path: each subject's volume streams through ONE
jitted program (:func:`rcu_tpu.eval.pipeline.make_volume_mc_eval_fn` — 21
forwards per slice batch + ECE bins + 11-threshold correction) and only the
eval CSV rows come back to the host. CSV schemas are identical to the staged
pipeline, so the analysis layer consumes the output unchanged.

This has no reference counterpart — it exists because the fused TPU program
makes the staging unnecessary.

Coverage: MC-dropout (entropy protocol; the headline workload) and aleatoric
(auto-detected sigma head; global-rescale protocol). Auxiliary (confidence)
and ensemble runs evaluate through the staged pipeline, whose artifacts
their multi-model plumbing needs anyway.
"""
from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np

from rcu_tpu import directories as dirs
from rcu_tpu.engine import checkpoint as ckpt_lib
from rcu_tpu.engine import config as cfg_lib
from rcu_tpu.engine import databuild
from rcu_tpu.engine.state import create_train_state
from rcu_tpu.eval import hooks as ev_hooks
from rcu_tpu.eval.actions import CORRECTION_KEYS, csv_value
from rcu_tpu.eval.pipeline import make_volume_mc_eval_fn
from rcu_tpu.models import get_model, get_optimizer

DEFAULT_THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


def _load_model_state(model_dir: str, test_at, input_shape):
    mf = ckpt_lib.ModelFiles.from_model_dir(model_dir)
    model_node, _ = ckpt_lib.load_model_parameters(mf)
    model = get_model(model_node.type, model_node.params)
    path = ckpt_lib.find_checkpoint_file(mf, test_at)
    if path is None:
        raise FileNotFoundError(f"no checkpoint '{test_at}' in {model_dir}")
    optimizer = get_optimizer("adam", {"lr": 1e-4})  # template only
    state = create_train_state(model, optimizer, input_shape)
    raw = ckpt_lib.load_checkpoint(path)
    from flax import serialization
    restored = serialization.from_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": raw["params"], "batch_stats": raw["batch_stats"]})
    return model, restored["params"], restored["batch_stats"]


def evaluate_direct(config: cfg_lib.TestConfiguration, out_dir: str,
                    run_id: str = "baseline", mc: int = None,
                    thresholds=DEFAULT_THRESHOLDS, mesh=None,
                    masked: bool = True, subject_parallel: bool = False) -> dict:
    """Run MC inference + eval for every test-split subject, one dispatch per
    volume; write the ``eval_calibration_*`` and ``eval_uncertainty_*_th*``
    CSV families into ``out_dir``. Returns the per-subject ECE dict.

    ``masked=True`` applies the BraTS t2>0 head-support foreground mask,
    derived from the RAW t2 source file recorded in the store's files
    metadata (the stored channels are z-scored, so thresholding them would be
    wrong); ``masked=False`` evaluates unmasked (the ISIC convention).

    Two multi-chip modes with a ``mesh``:
    - latency (default): each volume's work is sharded ACROSS the mesh —
      fastest single-subject answer;
    - throughput (``subject_parallel=True``): whole subjects round-robin onto
      individual mesh devices with params replicated per device; dispatches
      are async so all chips stay busy with zero cross-chip communication —
      fastest full-testset wall clock. Results are identical either way.

    Native-2D datasets (image volume without a slice axis) run CHUNKED:
    ``test_data.batch_size`` whole images per dispatch on the conv batch
    axis, with every image's own eval reductions vmapped in the same program
    (full MXU utilization; K-fold fewer dispatch round trips). The config's
    transform pipeline is applied per item, exactly as the staged loader
    would.
    """
    mc = mc or int(config.others.get("mc") or 20)
    subjects = None
    if config.split:
        from rcu_tpu.data.split import load_split
        _, _, subjects = load_split(config.split, config.others.get("split_k"))
    data = databuild.build_data(config.test_data, subjects=subjects,
                                seed=config.seed)
    dataset = data.dataset
    transform = databuild.build_transform(config.test_data.transform)

    first_vol = np.asarray(dataset.read_volume(dataset.subjects[0], "images"))
    is_2d = first_vol.ndim == 3  # (H, W, C) — no slice axis (ISIC)
    h, w, in_ch = first_vol.shape[-3:]
    batch_size = config.test_data.batch_size
    if mesh is not None and not subject_parallel:
        # latency mode shards each step's batch axis over the mesh, so it
        # must divide the device count (throughput mode dispatches whole
        # subjects to single devices and needs no padding)
        from rcu_tpu.parallel.mesh import pad_batch_size_to_mesh
        batch_size = pad_batch_size_to_mesh(batch_size, mesh)

    model, params, batch_stats = _load_model_state(
        config.model_dir,
        "best" if config.test_at in (None, "") else config.test_at,
        (1, h, w, in_ch))
    if mesh is not None:
        from rcu_tpu.parallel.inference import replicate_tree
        params = replicate_tree(params, mesh)
        batch_stats = replicate_tree(batch_stats, mesh)

    # sigma-headed models evaluate via the ALEATORIC protocol (global sigma
    # rescale, fold by prediction) — same result-id suffix as the staged run
    aleatoric = bool(getattr(model, "sigma_out", False))
    if aleatoric and is_2d:
        raise NotImplementedError(
            "direct aleatoric eval currently covers volume (3-D) datasets; "
            "use the staged pipeline (isic_test_aleatoric + "
            "eval_uncertainty) for native-2D aleatoric runs")
    result_id = f"{run_id}_globalrescale" if aleatoric else run_id

    thresholds_arr = np.asarray(thresholds, np.float32)
    os.makedirs(out_dir, exist_ok=True)
    calib_hook = ev_hooks.WriteBinsCsvHook(os.path.join(
        out_dir, dirs.CALIBRATION_PLACEHOLDER.format(result_id)))
    corr_hooks = []
    for threshold in thresholds:
        threshold_str = f"{threshold:.2f}".replace(".", "")
        corr_hooks.append(ev_hooks.WriteCsvHook(os.path.join(
            out_dir, dirs.UNCERTAINTY_PLACEHOLDER.format(result_id,
                                                         threshold_str)), None))

    def foreground_mask(subject, shape):
        """BraTS t2>0 head-support mask from the RAW source NIfTI recorded in
        the store's files metadata (eval/analysis.py _get_t2_mask semantics).
        The stored image channels are intensity-normalized, so thresholding
        them would select 'above-mean' voxels, not the head region."""
        from rcu_tpu.data import nifti
        t2_path = (dataset.files(subject) or {}).get("images", {}).get("t2")
        if not t2_path or not os.path.exists(t2_path):
            raise ValueError(
                f"subject '{subject}' has no raw t2 source file recorded in "
                "the store, so the foreground mask cannot be derived (the "
                "stored channels are z-scored). Pass masked=False to "
                "evaluate unmasked, or rebuild the store with files metadata.")
        arr, _ = nifti.read(t2_path)
        fg = np.squeeze(np.asarray(arr)) > 0
        if fg.shape != tuple(shape):
            raise ValueError(
                f"subject '{subject}': raw-t2 mask shape {fg.shape} does not "
                f"match the target shape {tuple(shape)} — the store (or the "
                "config's transform pipeline) changed the geometry relative "
                "to the raw source. Pass masked=False or align geometries.")
        return fg

    def load_subject(subject):
        volume = np.asarray(dataset.read_volume(subject, "images"), np.float32)
        labels = np.squeeze(np.asarray(dataset.read_volume(subject, "labels")))
        if transform is not None:
            # the staged loader applies transforms per slice item (H,W,C),
            # so spatial transforms (e.g. size) must see slices here too —
            # a whole-volume call would treat Z as the first spatial axis
            outs = [transform({"images": volume[z], "labels": labels[z]})
                    for z in range(volume.shape[0])]
            volume = np.stack(
                [np.asarray(o["images"], np.float32) for o in outs])
            labels = np.squeeze(np.stack(
                [np.asarray(o["labels"]) for o in outs]))
        if labels.ndim > 3:
            labels = labels[..., 0]
        target = (labels > 0.5).astype(np.uint8)
        mask = foreground_mask(subject, target.shape) if masked \
            else np.ones(target.shape, bool)
        nz = volume.shape[0]
        pad = (-nz) % batch_size
        if pad:
            volume = np.concatenate(
                [volume, np.zeros((pad,) + volume.shape[1:], volume.dtype)])
        batched = volume.reshape((-1, batch_size) + volume.shape[1:])
        return batched, target, mask, nz

    # overlap the next subject's host H5 read with the current device pass
    import concurrent.futures
    pool = concurrent.futures.ThreadPoolExecutor(1, thread_name_prefix="direct")

    # throughput mode: whole subjects round-robin onto single devices; each
    # device holds its own replica of the params (no cross-chip traffic)
    devices = list(mesh.devices.flat) if (subject_parallel and mesh is not None) \
        else None
    if devices:
        per_device_state = {
            d: (jax.device_put(params, d), jax.device_put(batch_stats, d))
            for d in devices}

    fused_cache = {}
    rng = jax.random.PRNGKey(config.seed)
    eces = {}
    names = list(dataset.subjects)

    if is_2d:
        # native-2D datasets: K whole images per dispatch (K rides the conv
        # batch axis — full MXU utilization and K-fold fewer tunnel round
        # trips) with every image's OWN eval reductions vmapped on device
        return _evaluate_direct_2d(
            model, params, batch_stats, dataset, names, transform, masked,
            foreground_mask, mc, batch_size, thresholds_arr, mesh, devices,
            per_device_state if devices else None, rng, pool,
            calib_hook, corr_hooks, result_id)

    def dispatch(si, subject_inputs):
        batched, target, mask, nz = subject_inputs
        key = (nz, batched.shape[0])
        if key not in fused_cache:
            # artifacts=False: only the eval reductions come back, so no dead
            # per-voxel volumes are held by the async window (or all-gathered
            # across the mesh in latency mode)
            fused_cache[key] = make_volume_mc_eval_fn(
                model, mc, batch_size, nz, mesh=None if devices else mesh,
                artifacts=False)
        fn = fused_cache[key]
        step_rng = jax.random.fold_in(rng, si)
        if devices:
            dev = devices[si % len(devices)]
            p, bs = per_device_state[dev]
            out = fn(p, bs, jax.device_put(batched, dev),
                     jax.device_put(target, dev), jax.device_put(mask, dev),
                     jax.device_put(thresholds_arr, dev), step_rng)
        else:
            out = fn(params, batch_stats, batched, target, mask,
                     thresholds_arr, step_rng)
        return out

    def fetch(subject, out, t0):
        corr = {k: np.asarray(v) for k, v in out["correction"].items()}
        calib_hook.on_subject({
            "bins_count": np.asarray(out["bins_count"]).astype(np.int64),
            "bins_avg_confidence": np.asarray(out["bins_avg_confidence"]),
            "bins_positive_fraction": np.asarray(out["bins_positive_fraction"]),
            "bins_non_zero": np.asarray(out["bins_non_zero"]),
            "ece": float(out["ece"]),
            # dice of the thresholded fg vs target: already in the fused
            # program's correction counts (threshold-independent entry), so no
            # 20+ MB fg volume needs to cross the tunnel for it
            "dice": float(corr["dice"][0]),
        }, subject, result_id)
        for ti, hook in enumerate(corr_hooks):
            hook.on_subject({k: csv_value(k, corr[k][ti])
                             for k in CORRECTION_KEYS}, subject, result_id)
        eces[subject] = float(out["ece"])
        logging.info("direct eval %s ece=%.5f (%.2fs)", subject,
                     eces[subject], time.time() - t0)

    if aleatoric:
        # two passes, mirroring the staged sigma run: (A) global min/max of
        # the predicted-class sigma over the whole run (the minmax action),
        # (B) per-subject fused rescale+fold+eval with those bounds
        is_log_sigma = cfg_lib.require_log_sigma(config)
        from rcu_tpu.eval.pipeline import (make_volume_aleatoric_eval_fn,
                                           make_volume_sigma_minmax_fn)
        window = 2 * len(devices) if devices else 1
        caches = {"minmax": {}, "eval": {}}

        def _fn(kind, factory, nz, n_batches):
            key = (nz, n_batches)
            if key not in caches[kind]:
                caches[kind][key] = factory(
                    model, batch_size, nz, is_log_sigma,
                    mesh=None if devices else mesh)
            return caches[kind][key]

        def _device_args(si, arrays):
            if not devices:
                return (params, batch_stats) + arrays
            dev = devices[si % len(devices)]
            p, bs = per_device_state[dev]
            return (p, bs) + tuple(jax.device_put(a, dev) for a in arrays)

        bounds = {"min": [], "max": []}

        def minmax_dispatch(si, subject, loaded):
            batched, _target, _mask, nz = loaded
            fn = _fn("minmax", make_volume_sigma_minmax_fn, nz,
                     batched.shape[0])
            return fn(*_device_args(si, (batched,)))

        def minmax_fetch(subject, out, t0):
            mn, mx = out
            bounds["min"].append(float(mn))
            bounds["max"].append(float(mx))

        _drive(pool, names, load_subject, minmax_dispatch, minmax_fetch,
               window)
        gmin, gmax = min(bounds["min"]), max(bounds["max"])
        if not gmax > gmin:
            # a collapsed sigma head would divide 0/0 in the rescale and
            # write NaN into every CSV cell — fail loudly instead
            raise ValueError(
                f"degenerate sigma range [{gmin}, {gmax}] across the run — "
                "the sigma head produced a constant map; the global-rescale "
                "protocol cannot evaluate it")
        ev_hooks.WriteSummaryCsvHook(
            os.path.join(out_dir, dirs.MINMAX_PLACEHOLDER.format(run_id)),
            confidence_entry="sigma").on_run_end(bounds, run_id)
        logging.info("direct aleatoric: global sigma range [%.6f, %.6f]",
                     gmin, gmax)

        def al_dispatch(si, subject, loaded):
            batched, target, mask, nz = loaded
            fn = _fn("eval", make_volume_aleatoric_eval_fn, nz,
                     batched.shape[0])
            return fn(*_device_args(si, (batched, target, mask,
                                         thresholds_arr)),
                      np.float32(gmin), np.float32(gmax))

        _drive(pool, names, load_subject, al_dispatch, fetch, window)
        pool.shutdown()
        calib_hook.on_run_end({}, result_id)
        for hook in corr_hooks:
            hook.on_run_end({}, result_id)
        return eces

    # dispatches are async: keep up to 2x the device count in flight so every
    # chip stays busy while bounding on-device output memory
    _drive(pool, names, load_subject,
           lambda i, subject, loaded: dispatch(i, loaded), fetch,
           window=2 * len(devices) if devices else 1)

    pool.shutdown()
    calib_hook.on_run_end({}, result_id)
    for hook in corr_hooks:
        hook.on_run_end({}, result_id)
    return eces


def _drive(pool, items, load_fn, dispatch_fn, fetch_fn, window: int):
    """Shared async driver for both direct-eval paths: load-ahead ONE item on
    the pool thread, keep up to ``window`` device dispatches in flight, drain
    in order (jax dispatch is async, so the window bounds on-device output
    buffers without stalling the chips)."""
    import collections
    pending = collections.deque()
    future = pool.submit(load_fn, items[0]) if items else None
    for i, item in enumerate(items):
        t0 = time.time()
        loaded = future.result()
        if i + 1 < len(items):
            future = pool.submit(load_fn, items[i + 1])
        out = dispatch_fn(i, item, loaded)
        pending.append((item, out, t0))
        while len(pending) > window:
            fetch_fn(*pending.popleft())
    while pending:
        fetch_fn(*pending.popleft())


def _evaluate_direct_2d(model, params, batch_stats, dataset, names, transform,
                        masked, foreground_mask, mc, chunk_size,
                        thresholds_arr, mesh, devices, per_device_state, rng,
                        pool, calib_hook, corr_hooks, run_id):
    """Chunked native-2D eval: K images per dispatch through
    :func:`rcu_tpu.eval.pipeline.make_image_batch_mc_eval_fn`. Latency mode
    shards the image axis over the mesh; throughput mode (``devices``)
    round-robins whole chunks onto single devices. Heterogeneous image sizes
    split a chunk into same-shape sub-batches (jit retraces per shape, like
    the pre-chunking per-image path did)."""
    from rcu_tpu.eval.pipeline import make_image_batch_mc_eval_fn

    chunk_size = max(1, int(chunk_size))
    fn = make_image_batch_mc_eval_fn(model, mc,
                                     mesh=None if devices else mesh)

    def load_image(subject):
        image = np.asarray(dataset.read_volume(subject, "images"), np.float32)
        labels = np.squeeze(np.asarray(dataset.read_volume(subject, "labels")))
        if transform is not None:
            out_t = transform({"images": image, "labels": labels})
            image = np.asarray(out_t["images"], np.float32)
            labels = np.squeeze(np.asarray(out_t["labels"]))
        if labels.ndim == 3 and labels.shape[-1] == 2:
            labels = labels[..., 0]  # [gt, baseline-pred] channels
        target = (labels > 0.5).astype(np.uint8)
        mask = foreground_mask(subject, target.shape) if masked \
            else np.ones(target.shape, bool)
        return image, target, mask

    def load_chunk(group):
        """-> list of same-shape parts [(subjects, images, targets, masks)].
        Only the LAST part of a chunk is padded to a full sub-batch; padded
        outputs are dropped host-side."""
        triples = [(s, *load_image(s)) for s in group]
        parts = []
        start = 0
        for i in range(1, len(triples) + 1):
            if i == len(triples) or triples[i][1].shape != triples[start][1].shape:
                same = triples[start:i]
                images = np.stack([t[1] for t in same])
                targets = np.stack([t[2] for t in same])
                masks = np.stack([t[3] for t in same])
                pad = (chunk_size - len(same)) if i == len(triples) else 0
                if pad:  # static shape for the common tail-of-run case
                    images = np.concatenate([images, np.zeros(
                        (pad,) + images.shape[1:], images.dtype)])
                    targets = np.concatenate([targets, np.zeros(
                        (pad,) + targets.shape[1:], targets.dtype)])
                    masks = np.concatenate([masks, np.ones(
                        (pad,) + masks.shape[1:], masks.dtype)])
                parts.append(([t[0] for t in same], images, targets, masks))
                start = i
        return parts

    groups = [names[i:i + chunk_size]
              for i in range(0, len(names), chunk_size)]
    eces = {}

    def dispatch(ci, group, parts):
        outs = []
        for pi, (subjects, images, targets, masks) in enumerate(parts):
            key = jax.random.fold_in(rng, ci * chunk_size + pi)
            if devices:
                dev = devices[(ci + pi) % len(devices)]
                p, bs = per_device_state[dev]
                out = fn(p, bs, jax.device_put(images, dev),
                         jax.device_put(targets, dev),
                         jax.device_put(masks, dev),
                         jax.device_put(thresholds_arr, dev), key)
            else:
                out = fn(params, batch_stats, images, targets, masks,
                         thresholds_arr, key)
            outs.append((subjects, out))
        return outs

    def fetch(group, outs, t0):
        all_ece = []
        for subjects, out in outs:
            bins_count = np.asarray(out["bins_count"]).astype(np.int64)
            bins_conf = np.asarray(out["bins_avg_confidence"])
            bins_frac = np.asarray(out["bins_positive_fraction"])
            bins_nz = np.asarray(out["bins_non_zero"])
            ece_arr = np.asarray(out["ece"])
            dice_arr = np.asarray(out["dice"])
            corr = {k: np.asarray(v) for k, v in out["correction"].items()}
            for i, subject in enumerate(subjects):
                calib_hook.on_subject({
                    "bins_count": bins_count[i],
                    "bins_avg_confidence": bins_conf[i],
                    "bins_positive_fraction": bins_frac[i],
                    "bins_non_zero": bins_nz[i],
                    "ece": float(ece_arr[i]),
                    "dice": float(dice_arr[i]),
                }, subject, run_id)
                for ti, hook in enumerate(corr_hooks):
                    hook.on_subject({k: csv_value(k, corr[k][i, ti])
                                     for k in CORRECTION_KEYS}, subject,
                                    run_id)
                eces[subject] = float(ece_arr[i])
                all_ece.append(float(ece_arr[i]))
        logging.info("direct eval [%s..%s] mean ece=%.5f (%d images, %.2fs)",
                     group[0], group[-1], float(np.mean(all_ece)),
                     len(group), time.time() - t0)

    _drive(pool, groups, load_chunk, dispatch, fetch,
           window=2 * len(devices) if devices else 1)

    pool.shutdown()
    calib_hook.on_run_end({}, run_id)
    for hook in corr_hooks:
        hook.on_run_end({}, run_id)
    return eces
