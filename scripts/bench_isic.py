"""Native-2D (ISIC) direct-eval microbench on the TPU: chunked vs per-image.

Measures the chunked image-batch program
(:func:`rcu_tpu.eval.pipeline.make_image_batch_mc_eval_fn` — K whole
192x256 images per dispatch, T=20 MC forwards, per-image eval reductions
vmapped) against the per-image dispatch it replaced, f32 and bf16. The
chunking win is mostly dispatch amortization over the remote link plus full
MXU batching (measured r2: ~22 img/s chunked vs ~0.5 per-image on one
chip — the full 600-image ISIC test set in ~27 s).

Prints one JSON line per configuration.
"""
import json
import os
import sys
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

H, W, C = 192, 256, 3
K = 32          # images per chunk (the conv batch axis)
MC_T = 20
THRESHOLDS = [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]


def _model(dtype):
    from rcu_tpu.models import get_model
    kwargs = dict(nb_classes=2, in_channels=C, depth=4, start_filters=32,
                  dropout=0.05)
    if dtype:
        kwargs["dtype"] = dtype
    model = get_model("unet", kwargs)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda k: model.init({"params": k}, jnp.zeros((1, H, W, C)),
                                 train=False))(jax.random.PRNGKey(0))
    return (model, jax.device_put(variables["params"]),
            jax.device_put(variables.get("batch_stats", {})))


def bench(dtype=None, chunk=K, n_chunks=3):
    from rcu_tpu.eval.pipeline import make_image_batch_mc_eval_fn
    model, params, batch_stats = _model(dtype)
    fn = make_image_batch_mc_eval_fn(model, MC_T)

    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(chunk, H, W, C).astype(np.float32))
    targets = jax.device_put((rng.rand(chunk, H, W) < 0.3).astype(np.uint8))
    masks = jax.device_put(np.ones((chunk, H, W), bool))
    th = jnp.asarray(THRESHOLDS, jnp.float32)

    out = fn(params, batch_stats, images, targets, masks, th,
             jax.random.PRNGKey(99))
    float(jnp.sum(out["ece"]))  # value fetch = the only reliable remote sync
    rates = []
    for v in range(n_chunks):
        t0 = time.perf_counter()
        out = fn(params, batch_stats, images, targets, masks, th,
                 jax.random.PRNGKey(v))
        float(jnp.sum(out["ece"]))
        rates.append(chunk / (time.perf_counter() - t0))
    return max(rates), sum(rates) / len(rates)


def main():
    for dtype in (None, "bfloat16"):
        best, mean = bench(dtype)
        print(json.dumps({
            "metric": "isic_mc20_chunked_eval_images_per_sec",
            "dtype": dtype or "float32",
            "value": round(best, 2), "mean": round(mean, 2),
            "chunk": K, "image": [H, W, C],
        }))
    # the per-image dispatch the chunked program replaced (chunk=1)
    best, mean = bench(None, chunk=1, n_chunks=4)
    print(json.dumps({
        "metric": "isic_mc20_per_image_images_per_sec",
        "dtype": "float32", "value": round(best, 2), "mean": round(mean, 2),
        "chunk": 1, "image": [H, W, C],
    }))


if __name__ == "__main__":
    main()
