"""Training-step microbench on the TPU: voxels/sec + step time, f32 vs bf16.

Measures the stock CE train step (fwd + bwd + optax update + BN mutation) on
BraTS-sized slice batches (32 x 240 x 240 x 4) with the paper U-Net
(depth 4, 32 start filters). Prints one JSON line per dtype. Params/BN stats
stay f32 in both settings; bf16 is the compute dtype only.

Run: python scripts/bench_train.py  (uses the default — TPU — backend; the
persistent compile cache in .jax_cache/ makes repeat runs start fast.)
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

B, H, W, C = 32, 240, 240, 4
STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", "20"))


def bench(dtype=None):
    from rcu_tpu.engine import steps as steps_lib
    from rcu_tpu.engine.state import create_train_state
    from rcu_tpu.models import get_model, get_optimizer

    kwargs = dict(nb_classes=2, in_channels=C, depth=4, start_filters=32,
                  dropout=0.05)
    if dtype:
        kwargs["dtype"] = dtype
    model = get_model("unet", kwargs)
    optimizer = get_optimizer("adam", {"lr": 1e-4})
    state = create_train_state(model, optimizer, (1, H, W, C))
    train_step = steps_lib.make_train_step(model, optimizer)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, H, W, C), jnp.float32),
        "labels": jnp.asarray(rng.rand(B, H, W) > 0.5, jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    state, metrics = train_step(state, batch, key)  # compile + warm
    float(metrics["loss"])  # value fetch = the only reliable remote sync

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    loss = float(metrics["loss"])  # sync the tail of the dispatch queue
    dt = time.perf_counter() - t0
    return STEPS / dt, loss


def main():
    for dtype in (None, "bfloat16"):
        steps_per_sec, loss = bench(dtype)
        print(json.dumps({
            "metric": "train_step_voxels_per_sec",
            "dtype": dtype or "float32",
            "value": round(steps_per_sec * B * H * W, 1),
            "steps_per_sec": round(steps_per_sec, 3),
            "batch": [B, H, W, C],
            "loss": round(loss, 5),
        }))


if __name__ == "__main__":
    main()
