"""Native-2D (ISIC) benchmark on the TPU: chip rate, driver rate, and the
attribution between them.

Round 3 recorded 31-32 img/s for the chunked program — but that number
synced (``float(...)``) after every single K=32 chunk, ~0.2 s of device work
per round trip over the remote-TPU tunnel, violating the repo's own rule
that a dispatch needs ~1 s of device work or RTT dominates (CLAUDE.md). This
bench separates the quantities:

1. ``chunk_scan``  — the CHIP rate: ``make_image_batch_mc_eval_fn`` with
   ``n_chunks=G`` scans G K-image chunks inside one dispatch (>= 1 s of
   device work), mirroring the volume program's multi-batch ``lax.scan``.
   Reports img/s, Mvox/s, and MFU (XLA cost analysis of the one-chunk
   program x G — the scan body compiles once, like bench.py's method).
2. ``noeval_scan`` — the same G-chunk scan WITHOUT the per-image vmapped
   eval reductions: attributes the eval epilogue's share of the chip rate.
3. ``chunk_sync``  — the round-3 measurement (one chunk per dispatch,
   sync per chunk), kept to quantify the tunnel-RTT contamination.
4. ``driver_e2e``  — the SHIPPED ``evaluate_direct`` 2-D driver (lookahead
   window, H5 reads overlapped) over a synthetic 600-image ISIC-shaped
   store: the number a user actually gets for the full test set. Over the
   remote-TPU tunnel this leg is upload-bound, so it reports the link's
   contemporaneous H2D bandwidth and the driver's fraction of the
   upload-bound rate (on a co-located host, PCIe H2D makes the driver
   device-bound at the chunk_scan rate).

The ISIC test protocol matched: /root/reference/bin-dl/isic_test_default.py
(T=20 MC over whole images). Compare Mvox/s with the BraTS headline in
BENCH_r*.json — identical U-Net work per voxel.

Prints one JSON line per configuration plus a final attribution line.
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H = int(os.environ.get("BENCH_ISIC_H", "192"))
W = int(os.environ.get("BENCH_ISIC_W", "256"))
C = 3
K = int(os.environ.get("BENCH_ISIC_K", "32"))  # images/chunk (conv batch)
G = int(os.environ.get("BENCH_ISIC_CHUNKS", "16"))  # chunks per dispatch
MC_T = int(os.environ.get("BENCH_ISIC_T", "20"))
N_DRIVER_IMAGES = int(os.environ.get("BENCH_ISIC_IMAGES", "600"))
THRESHOLDS = [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
V5E_BF16_PEAK_FLOPS = 197e12
VOX = H * W


def _model(dtype, fast_decoder=False):
    from rcu_tpu.models import FAST_DECODER_KWARGS, get_model
    kwargs = dict(nb_classes=2, in_channels=C, depth=4, start_filters=32,
                  dropout=0.05)
    if dtype:
        kwargs["dtype"] = dtype
    if fast_decoder:
        # concat-free + fused-upsample decoder (models/unet.py; gated by
        # tests/test_fast_decoder.py at the production 1e-3 bar)
        kwargs.update(FAST_DECODER_KWARGS)
    model = get_model("unet", kwargs)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda k: model.init({"params": k}, jnp.zeros((1, H, W, C)),
                                 train=False))(jax.random.PRNGKey(0))
    # pre-cast params to the compute dtype like the production loader
    # (models/unet.precast_params — no-op for f32 models)
    from rcu_tpu.models import precast_params
    params, batch_stats = precast_params(
        model, variables["params"], variables.get("batch_stats", {}))
    return (model, jax.device_put(params), jax.device_put(batch_stats))


def _flops_per_image(model, params, batch_stats):
    """Analytic forward FLOPs per image from the ONE-chunk program (the
    G-chunk scan body compiles once, so its cost analysis undercounts)."""
    from rcu_tpu.eval.pipeline import make_image_batch_mc_eval_fn
    fn = make_image_batch_mc_eval_fn(model, MC_T)
    args = (params, batch_stats, jnp.zeros((K, H, W, C), jnp.float32),
            jnp.zeros((K, H, W), jnp.uint8), jnp.ones((K, H, W), bool),
            jnp.asarray(THRESHOLDS, jnp.float32), jax.random.PRNGKey(0))
    try:
        analysis = fn.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"]) / K
    except Exception:
        return None


def _sync(x):
    return float(jnp.sum(x))  # value fetch = the only reliable remote sync


def bench_chunk_scan(dtype=None, n_rounds=3, eval_reductions=True,
                     fast_decoder=False, quantize=False):
    """G chunks per dispatch. Returns (best img/s, mean img/s, flops/img)."""
    from rcu_tpu.eval import pipeline as pl
    model, params, batch_stats = _model(dtype, fast_decoder)
    if quantize:
        # int8 PTQ trunk (ops/quant.py; gated by tests/test_quant.py):
        # calibrate on the bench's own input distribution, on CPU (the
        # un-jitted calibration apply would be one tunnel RTT per op)
        from rcu_tpu.ops import quant as quant_ops
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            cal = jnp.asarray(np.random.RandomState(7)
                              .rand(K, H, W, C).astype(np.float32))
            scales = quant_ops.calibrate_scales(
                model, {"params": jax.device_get(params),
                        "batch_stats": jax.device_get(batch_stats)}, [cal])
        model = model.copy(quant_scales=scales,
                           quant_skip_levels=quant_ops.DEFAULT_SKIP_LEVELS)
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(G * K, H, W, C).astype(np.float32))
    targets = jax.device_put((rng.rand(G * K, H, W) < 0.3).astype(np.uint8))
    masks = jax.device_put(np.ones((G * K, H, W), bool))
    th = jnp.asarray(THRESHOLDS, jnp.float32)

    if eval_reductions:
        fn = pl.make_image_batch_mc_eval_fn(model, MC_T, n_chunks=G)

        def dispatch(key):
            return _sync(fn(params, batch_stats, images, targets, masks, th,
                            key)["ece"])
    else:
        # inference only: the same G-chunk MC scan, reduced to one scalar so
        # nothing but the conv stack (and softmax/mean/entropy) is measured
        def scan_only(p, s, imgs, key):
            batched = imgs.reshape((G, K, H, W, C))
            fg, ent, _ = pl._mc_scan(model, MC_T, p, s, batched, key)
            return jnp.sum(fg) + jnp.sum(ent)

        jfn = jax.jit(scan_only)

        def dispatch(key):
            return _sync(jfn(params, batch_stats, images, key))

    dispatch(jax.random.PRNGKey(99))  # compile + warm
    rates = []
    for v in range(n_rounds):
        t0 = time.perf_counter()
        dispatch(jax.random.PRNGKey(v))
        rates.append(G * K / (time.perf_counter() - t0))
    flops = _flops_per_image(model, params, batch_stats) \
        if eval_reductions and dtype else None
    return max(rates), sum(rates) / len(rates), flops


def bench_chunk_sync(dtype=None, n_chunks=4):
    """The round-3 methodology: ONE chunk per dispatch, sync per chunk —
    kept to quantify how much the tunnel round trip contaminates it."""
    from rcu_tpu.eval.pipeline import make_image_batch_mc_eval_fn
    model, params, batch_stats = _model(dtype)
    fn = make_image_batch_mc_eval_fn(model, MC_T)
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(K, H, W, C).astype(np.float32))
    targets = jax.device_put((rng.rand(K, H, W) < 0.3).astype(np.uint8))
    masks = jax.device_put(np.ones((K, H, W), bool))
    th = jnp.asarray(THRESHOLDS, jnp.float32)
    _sync(fn(params, batch_stats, images, targets, masks, th,
             jax.random.PRNGKey(99))["ece"])
    rates = []
    for v in range(n_chunks):
        t0 = time.perf_counter()
        _sync(fn(params, batch_stats, images, targets, masks, th,
                 jax.random.PRNGKey(v))["ece"])
        rates.append(K / (time.perf_counter() - t0))
    return max(rates), sum(rates) / len(rates)


def build_isic_store(path, n_images):
    from rcu_tpu.data import h5 as h5_lib
    from rcu_tpu.data.nifti import ImageProperties
    rng = np.random.RandomState(0)
    base_img = rng.rand(H, W, C).astype(np.float32)
    base_lbl = (rng.rand(H, W) > 0.6).astype(np.uint8)
    with h5_lib.DatasetWriter(path) as writer:
        for i in range(n_images):
            # cheap per-image variation; content doesn't affect the timing
            img = np.roll(base_img, i % 17, axis=1)
            writer.add_subject(f"ISIC_{i:07d}",
                               {"images": img, "labels": base_lbl},
                               props=ImageProperties(size=(W, H, 1)))
    return path


def measure_h2d_mb_s(mb: int = 32, reps: int = 3):
    """Contemporaneous host->device bandwidth: the driver leg below is
    upload-bound over the remote-TPU tunnel (idle ~34 MB/s, congestion
    takes it below 1), so every recorded driver rate must carry the link
    bandwidth measured at the same moment to be interpretable."""
    x = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        float(d[-1])  # force completion over the tunnel
        best = max(best, mb / (time.perf_counter() - t0))
    return best


def driver_upload_mb_per_image(dtype=None):
    """Host->device bytes the driver uploads per image: the image at the
    compute dtype (loader threads cast before upload) + uint8 target +
    bool mask."""
    img_itemsize = 2 if dtype else 4
    return (H * W * C * img_itemsize + H * W + H * W) / 1e6


def bench_driver(dtype=None, n_images=N_DRIVER_IMAGES):
    """The SHIPPED evaluate_direct 2-D driver end-to-end: store reads,
    chunking, async dispatch window, CSV writes."""
    from rcu_tpu.engine import config as cfg_lib
    from rcu_tpu.eval.direct import evaluate_direct

    tmp = tempfile.mkdtemp(prefix="bench_isic_")
    try:
        store = build_isic_store(os.path.join(tmp, "isic.h5"), n_images)
        cfg = cfg_lib.TestConfiguration(
            seed=0, split=None, model_dir=None, test_name="bench",
            test_dir=tmp, test_at="best", others={"mc": MC_T},
            test_data=cfg_lib.DataConfiguration.from_dict(
                {"batch_size": K, "dataset": store, "indexing": {"slice": {}},
                 "shuffle": False}))
        # bypass checkpoint loading: inject fresh params via the same model
        # the chip benches use (the driver path from dispatch onward is the
        # production one)
        model, params, batch_stats = _model(dtype)
        import rcu_tpu.eval.direct as direct_mod
        orig = direct_mod._load_model_state
        direct_mod._load_model_state = \
            lambda *a, **k: (model, params, batch_stats)
        try:
            t0 = time.perf_counter()
            eces = evaluate_direct(cfg, os.path.join(tmp, "out"),
                                   run_id="bench", strategy="mc",
                                   masked=False, dtype=dtype)
            elapsed = time.perf_counter() - t0
        finally:
            direct_mod._load_model_state = orig
        assert len(eces) == n_images
        return n_images / elapsed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    rows = {}
    for dtype in (None, "bfloat16"):
        name = dtype or "float32"
        best, mean, flops = bench_chunk_scan(dtype)
        mfu = None
        if flops:
            mfu = flops * best / V5E_BF16_PEAK_FLOPS
        rows[(name, "chunk_scan")] = best
        print(json.dumps({
            "metric": "isic_mc20_chunk_scan_images_per_sec", "dtype": name,
            "value": round(best, 2), "mean": round(mean, 2),
            "mvox_per_sec": round(best * VOX / 1e6, 3),
            "mfu": round(mfu, 4) if mfu else None,
            "chunk": K, "chunks_per_dispatch": G, "image": [H, W, C]}))

        fd_best, fd_mean, _ = bench_chunk_scan(dtype, fast_decoder=True)
        rows[(name, "chunk_scan_fastdec")] = fd_best
        # MFU in CANONICAL-model FLOPs (the plain leg's cost analysis): the
        # fast decoder does the same work in fewer instructions, same
        # convention as bench.py's headline MFU
        fd_mfu = flops * fd_best / V5E_BF16_PEAK_FLOPS if flops else None
        print(json.dumps({
            "metric": "isic_mc20_chunk_scan_fastdec_images_per_sec",
            "dtype": name, "value": round(fd_best, 2),
            "mean": round(fd_mean, 2),
            "mvox_per_sec": round(fd_best * VOX / 1e6, 3),
            "mfu": round(fd_mfu, 4) if fd_mfu else None,
            "note": "concat-free + fused-upsample decoder "
                    "(tests/test_fast_decoder.py gate)"}))

        if dtype == "bfloat16":
            q_best, q_mean, _ = bench_chunk_scan(dtype, fast_decoder=True,
                                                 quantize=True)
            rows[(name, "chunk_scan_int8")] = q_best
            q_mfu = flops * q_best / V5E_BF16_PEAK_FLOPS if flops else None
            print(json.dumps({
                "metric": "isic_mc20_chunk_scan_int8_fastdec_images_per_sec",
                "dtype": name, "value": round(q_best, 2),
                "mean": round(q_mean, 2),
                "mvox_per_sec": round(q_best * VOX / 1e6, 3),
                "mfu_canonical_bf16_flops":
                    round(q_mfu, 4) if q_mfu else None,
                "note": "int8 PTQ trunk + fast decoder "
                        "(tests/test_quant.py gate)"}))

        ne_best, ne_mean, _ = bench_chunk_scan(dtype, eval_reductions=False)
        rows[(name, "noeval_scan")] = ne_best
        print(json.dumps({
            "metric": "isic_mc20_noeval_scan_images_per_sec", "dtype": name,
            "value": round(ne_best, 2), "mean": round(ne_mean, 2),
            "mvox_per_sec": round(ne_best * VOX / 1e6, 3)}))

        sync_best, sync_mean = bench_chunk_sync(dtype)
        rows[(name, "chunk_sync")] = sync_best
        print(json.dumps({
            "metric": "isic_mc20_chunk_sync_images_per_sec", "dtype": name,
            "value": round(sync_best, 2), "mean": round(sync_mean, 2),
            "mvox_per_sec": round(sync_best * VOX / 1e6, 3),
            "note": "round-3 methodology: one K-chunk per dispatch, "
                    "sync per chunk — RTT-contaminated"}))

        h2d = measure_h2d_mb_s()
        drv = bench_driver(dtype)
        rows[(name, "driver")] = drv
        ub_rate = h2d / driver_upload_mb_per_image(dtype)
        print(json.dumps({
            "metric": "isic_mc20_direct_driver_images_per_sec", "dtype": name,
            "value": round(drv, 2),
            "mvox_per_sec": round(drv * VOX / 1e6, 3),
            "images": N_DRIVER_IMAGES,
            "seconds_for_set": round(N_DRIVER_IMAGES / drv, 1),
            "tunnel_h2d_mb_per_s": round(h2d, 1),
            "upload_bound_images_per_sec": round(ub_rate, 2),
            "pct_of_upload_bound": round(100 * drv / ub_rate, 1),
            "note": "remote-tunnel links are upload-bound; on a co-located "
                    "host (PCIe H2D) the driver is device-bound at the "
                    "chunk_scan rate"}))

    bf = rows.get(("bfloat16", "chunk_scan"))
    bf_sync = rows.get(("bfloat16", "chunk_sync"))
    bf_ne = rows.get(("bfloat16", "noeval_scan"))
    bf_drv = rows.get(("bfloat16", "driver"))
    # a negative epilogue share means the no-eval leg measured SLOWER than
    # the full program — pure run-to-run noise over the tunnel; report 0
    # (the epilogue is free within noise) instead of a nonsense negative
    epilogue = max(0.0, 100 * (1 - bf / bf_ne)) if bf and bf_ne else None
    # same clamp for the RTT share: a sync'd leg measuring FASTER than the
    # async leg is the same run-to-run tunnel noise
    rtt = max(0.0, 100 * (1 - bf_sync / bf)) if bf and bf_sync else None
    print(json.dumps({
        "metric": "isic_attribution",
        "rtt_contamination_pct": round(rtt, 1) if rtt is not None else None,
        "eval_epilogue_pct":
            round(epilogue, 1) if epilogue is not None else None,
        "driver_vs_chip_pct":
            round(100 * bf_drv / bf, 1) if bf and bf_drv else None,
    }))


if __name__ == "__main__":
    main()
