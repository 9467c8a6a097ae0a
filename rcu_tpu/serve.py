"""Production serving: a persistent MC-dropout inference service + HTTP front.

No reference counterpart — the reference stack (bin-dl/bin-eval) is offline
scripts only. This is the deployment surface for the fused TPU programs:
load a checkpoint ONCE, keep shape-specialized compiled volume programs warm,
and answer requests with the standard artifacts (prediction / foreground
probabilities / normalized entropy), optionally scoring them against a
provided ground truth with the same fused eval pass the offline pipeline
uses (rcu_tpu.eval.pipeline).

Wire protocol (stdlib-only on both ends; arrays ride npz):
  POST /v1/predict  body: ``.npz`` with ``images`` [Z,H,W,C] (or [H,W,C])
                    float32, optional ``target`` [Z,H,W] and — only together
                    with a target — ``mask`` [Z,H,W] (masks gate the eval
                    reductions, never the artifacts). Returns ``.npz`` with
                    prediction (uint8), probabilities, entropy (float32)
                    and, when a target was sent, ``ece`` plus the
                    per-threshold ``correction_*`` vectors.
  GET  /v1/health   -> JSON {status, model_dir, mc, compiled_shapes}

Device work is serialized through a lock (one XLA stream), while request
parsing/serialization runs on the HTTP server's worker threads.
"""
from __future__ import annotations

import io
import json
import logging
import threading
import zipfile

import jax
import numpy as np

from rcu_tpu.eval.pipeline import make_volume_mc_eval_fn, make_volume_mc_fn

DEFAULT_THRESHOLDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)


class VolumeInferenceService:
    """Checkpoint -> warm, shape-cached fused MC(+eval) volume programs."""

    def __init__(self, model_dir: str, test_at="best", mc: int = 20,
                 batch_size: int = 32, mesh=None,
                 thresholds=DEFAULT_THRESHOLDS, seed: int = 0):
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.eval.direct import _load_model_state
        self.model_dir = model_dir
        self.mc = int(mc)
        self.mesh = mesh
        self.thresholds = np.asarray(thresholds, np.float32)
        self.batch_size = int(batch_size)
        if mesh is not None:
            from rcu_tpu.parallel.mesh import pad_batch_size_to_mesh
            self.batch_size = pad_batch_size_to_mesh(self.batch_size, mesh)
        # the init-probe spatial shape is irrelevant for conv params, but the
        # channel count must match the checkpoint — read it from model.json
        model_node, _ = ckpt_lib.load_model_parameters(
            ckpt_lib.ModelFiles.from_model_dir(model_dir))
        self.in_channels = int(model_node.params.get("in_channels", 4))
        self.model, params, batch_stats = _load_model_state(
            model_dir, test_at, (1, 16, 16, self.in_channels))
        if mesh is not None:
            from rcu_tpu.parallel.inference import replicate_tree
            params = replicate_tree(params, mesh)
            batch_stats = replicate_tree(batch_stats, mesh)
        self.params, self.batch_stats = params, batch_stats
        self._programs = {}
        self._rng = jax.random.PRNGKey(seed)
        self._requests = 0
        self._lock = threading.Lock()

    def _program(self, vol_slices: int, with_eval: bool, batch: int):
        key = (vol_slices, with_eval, batch)
        if key not in self._programs:
            factory = make_volume_mc_eval_fn if with_eval else make_volume_mc_fn
            self._programs[key] = factory(self.model, self.mc, batch,
                                          vol_slices, mesh=self.mesh)
        return self._programs[key]

    def _effective_batch(self, nz: int) -> int:
        """Shrink the slice batch to the volume: a 1-slice (native-2D)
        request must not be padded out to a 32-slice batch of zeros. Small
        volumes bucket to the next power of two so the program cache stays
        bounded at ~log2(batch_size) entries instead of one per slice
        count (remote compiles cost 20-300s each)."""
        batch = min(self.batch_size, 1 << max(0, nz - 1).bit_length())
        if self.mesh is not None:
            from rcu_tpu.parallel.mesh import pad_batch_size_to_mesh
            batch = pad_batch_size_to_mesh(batch, self.mesh)
        return batch

    def compiled_shapes(self):
        # snapshot: a concurrent predict() may be inserting a new program
        return sorted(f"{nz}-slices-b{batch}{'-scored' if ev else ''}"
                      for nz, ev, batch in list(self._programs))

    def predict(self, images: np.ndarray, target: np.ndarray = None,
                mask: np.ndarray = None) -> dict:
        """One volume in, serving artifacts out (numpy). Thread-safe."""
        if target is None and mask is not None:
            # checked before any padding/device transfer: a rejected request
            # must not ship a 30+ MB volume across the tunnel first
            raise ValueError(
                "a mask without a target has no effect: masks only gate the "
                "eval reductions (ece), never the prediction artifacts — "
                "send a target to score, or drop the mask")
        volume = np.asarray(images, np.float32)
        if volume.ndim == 3:          # single image -> one-slice volume
            volume = volume[None]
        if volume.ndim != 4:
            raise ValueError(f"images must be [Z,H,W,C] or [H,W,C], got "
                             f"shape {volume.shape}")
        if volume.size == 0:
            raise ValueError(f"images array is empty: shape {volume.shape}")
        nz = volume.shape[0]
        batch = self._effective_batch(nz)
        pad = (-nz) % batch
        if pad:
            volume = np.concatenate(
                [volume, np.zeros((pad,) + volume.shape[1:], volume.dtype)])
        batched = volume.reshape((-1, batch) + volume.shape[1:])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from rcu_tpu.parallel.mesh import DATA_AXIS
            batched = jax.device_put(
                batched, NamedSharding(self.mesh, P(None, DATA_AXIS)))

        with self._lock:
            self._requests += 1
            rng = jax.random.fold_in(self._rng, self._requests)
            if target is None:
                # key the program on the PADDED slice count: near-identical
                # volumes (e.g. 150-160 slices at batch 32) then share one
                # compiled program, and the padded tail is trimmed host-side
                fn = self._program(batched.shape[0] * batch,
                                   with_eval=False, batch=batch)
                out = fn(self.params, self.batch_stats, batched, rng)
            else:
                target = (np.asarray(target) > 0.5).astype(np.uint8)
                if target.ndim == 2:
                    target = target[None]
                want = (nz,) + volume.shape[1:3]
                if target.shape != want:
                    raise ValueError(f"target shape {target.shape} does not "
                                     f"match the volume's {want}")
                m = np.ones(target.shape, bool) if mask is None \
                    else np.asarray(mask).reshape(target.shape) > 0
                fn = self._program(nz, with_eval=True, batch=batch)
                out = fn(self.params, self.batch_stats, batched, target, m,
                         self.thresholds, rng)

        result = {
            "prediction": np.asarray(out["prediction"] if target is None
                                     else out["fg"] > 0.5)[:nz].astype(np.uint8),
            "probabilities": np.asarray(out["fg"], np.float32)[:nz],
            "entropy": np.asarray(out["entropy"], np.float32)[:nz],
        }
        if target is not None:
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
                "mc": service.mc,
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
                result = service.predict(
                    payload["images"],
                    target=payload["target"] if "target" in payload else None,
                    mask=payload["mask"] if "mask" in payload else None)
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
