"""Model-serving CLI (no reference counterpart — the reference is offline
scripts only; this is the deployment surface for the fused TPU programs).

Loads a checkpoint once and serves volume inference over HTTP. Every
strategy family is served: MC-dropout (default; -mc 0 = deterministic),
aleatoric (sigma head; pass -is_log_sigma/-no_log_sigma), stacked-member
ensembles (-member DIR, repeatable), auxiliary feat (-segm_model_dir DIR)
and auxiliary segm (-aux_segm; requests carry a 'baseline' volume);
/v1/health reports the detected strategy.

  python bin/serve.py -model_dir out/.../model_x [-test_at best] [-mc 20]
      [-batch_size 32] [-devices N] [-host 0.0.0.0] [-port 8475]
      [-member DIR ...] [-is_log_sigma | -no_log_sigma]
      [-segm_model_dir DIR | -aux_segm] [-dtype bfloat16]

  POST /v1/predict  .npz{images[,target,mask,sigma_min,sigma_max,baseline]}
                    -> .npz{prediction, probabilities|sigma|confidence,
                    entropy[, ece, correction_*]}
  GET  /v1/health   JSON status + strategy + warm compiled shapes

Client example (stdlib only):
  import io, urllib.request, numpy as np
  buf = io.BytesIO(); np.savez_compressed(buf, images=volume)
  req = urllib.request.Request("http://host:8475/v1/predict",
                               data=buf.getvalue(), method="POST")
  out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""
import argparse
import logging
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, ""):  # bare-checkout script mode: python bin/<name>.py
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    BIN_DIR = os.path.dirname(os.path.abspath(__file__))
    if BIN_DIR not in sys.path:
        sys.path.insert(0, BIN_DIR)


def main(model_dir, test_at="best", mc=20, batch_size=32, devices=None,
         host="0.0.0.0", port=8475, prewarm=None, members=None,
         is_log_sigma=None, dtype=None, segm_model_dir=None,
         aux_segm=False, throughput=False, fast_decoder=False,
         fold_bn=False, quantize=False):
    try:  # package mode: rcu_tpu.cli.* (console entry points)
        from . import _cli
    except ImportError:  # bare-checkout script mode
        import _cli
    import jax
    # persistent compile cache: server restarts must not re-pay the 20-300s
    # remote compile per volume shape (same setup as bench.py / conftest)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from rcu_tpu.serve import VolumeInferenceService, make_http_server

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    mesh = _cli.mesh_from_devices(devices)
    service = VolumeInferenceService(model_dir, test_at=test_at, mc=mc,
                                     batch_size=batch_size, mesh=mesh,
                                     members=members,
                                     is_log_sigma=is_log_sigma, dtype=dtype,
                                     segm_model_dir=segm_model_dir,
                                     aux_segm=aux_segm,
                                     subject_parallel=throughput,
                                     fast_decoder=fast_decoder,
                                     fold_bn=fold_bn,
                                     quantize=quantize)
    if prewarm:
        import numpy as np
        in_ch = service.in_channels  # resolved from model.json at init
        for spec in prewarm.split(","):
            z, h, w = (int(v) for v in spec.lower().split("x"))
            logging.info("prewarming %dx%dx%d (unscored program)...", z, h, w)
            kw = {"baseline": np.zeros((z, h, w), np.uint8)} \
                if service.strategy == "auxiliary_segm" else {}
            # throughput mode compiles per device (executables key on the
            # committed device); the FIFO pool rotates, so one call per
            # pool device warms every chip
            for _ in range(service.pool_size):
                service.predict(np.zeros((z, h, w, in_ch), np.float32), **kw)
        logging.info("prewarmed programs: %s", service.compiled_shapes())
    server = make_http_server(service, host, port)
    logging.info("serving %s [%s] (mc=%d, batch=%d%s) on http://%s:%d",
                 model_dir, service.strategy, service.mc, service.batch_size,
                 f", {devices}-device mesh" if mesh is not None else "",
                 host, port)
    server.serve_forever()


def cli():
    parser = argparse.ArgumentParser(description="MC-dropout inference server")
    parser.add_argument("-model_dir", type=str, required=True)
    parser.add_argument("-test_at", type=str, default="best",
                        help="checkpoint selector: best | last | epoch int")
    parser.add_argument("-mc", type=int, default=20)
    parser.add_argument("-batch_size", type=int, default=32)
    parser.add_argument("-devices", type=int, default=None,
                        help="shard each volume over an N-device mesh")
    parser.add_argument("-host", type=str, default="0.0.0.0")
    parser.add_argument("-port", type=int, default=8475)
    parser.add_argument("-prewarm", type=str, default=None,
                        help="comma-separated ZxHxW volume shapes whose "
                             "(unscored) programs compile before the port "
                             "binds, e.g. 155x240x240")
    parser.add_argument("-member", type=str, action="append", default=None,
                        help="additional ensemble member model dir "
                             "(repeatable; model_dir is the primary member)")
    parser.add_argument("-is_log_sigma", dest="is_log_sigma",
                        action="store_true", default=None,
                        help="the sigma head emits log(sigma) (aleatoric "
                             "checkpoints; required for them)")
    parser.add_argument("-no_log_sigma", dest="is_log_sigma",
                        action="store_false",
                        help="the sigma head emits raw sigma")
    parser.add_argument("-dtype", type=str, default=None,
                        help="compute dtype override, e.g. bfloat16 (the "
                             "production dtype; params stay f32)")
    parser.add_argument("-segm_model_dir", type=str, default=None,
                        help="auxiliary-feat: the frozen segmenter's model "
                             "dir (model_dir then holds the PostNet)")
    parser.add_argument("-aux_segm", action="store_true",
                        help="auxiliary-segm error net: requests must carry "
                             "a 'baseline' prediction volume")
    parser.add_argument("-fast_decoder", action="store_true",
                        help="concat-free + fused-upsample U-Net decoder "
                             "(same checkpoints; gated at the production "
                             "1e-3 bar by tests/test_fast_decoder.py)")
    parser.add_argument("-fold_bn", action="store_true",
                        help="fold BatchNorms into convs at load "
                             "(deterministic strategies only, not mc>0; "
                             "gated by tests/test_fold_bn.py)")
    parser.add_argument("-quantize", action="store_true",
                        help="int8 PTQ trunk (mc/deterministic/ensemble "
                             "only): calibrates on the first request's "
                             "center slices; ~2x MXU rate over bf16 "
                             "(gated by tests/test_quant.py)")
    parser.add_argument("-throughput", action="store_true",
                        help="with -devices N: replicate the model per "
                             "device and run concurrent requests on "
                             "different chips (server throughput ~N x) "
                             "instead of sharding each request (lowest "
                             "single-request latency)")
    args = parser.parse_args()
    main(args.model_dir, args.test_at, args.mc, args.batch_size,
         args.devices, args.host, args.port, args.prewarm, args.member,
         args.is_log_sigma, args.dtype, args.segm_model_dir, args.aux_segm,
         args.throughput, args.fast_decoder, args.fold_bn,
         args.quantize)


if __name__ == "__main__":
    cli()
