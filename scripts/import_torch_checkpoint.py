"""Migrate a reference model dir (torch) into an rcu_tpu model dir.

For users switching from the reference implementation with already-trained
models: converts every ``checkpoint*.pth`` under
``<ref_model_dir>/checkpoints/`` (reference common/model/management.py:97-100
payloads — {'state_dict', 'epoch', 'optimizer', ...}) into this framework's
msgpack checkpoints, and the reference ``model.json`` into ours. The weight
mapping is the same structural transplant the parity tests prove bit-close
(tests/test_model_weight_parity.py): torch OIHW conv kernels -> flax HWIO,
BatchNorm weight/bias/running stats -> scale/bias/mean/var, module paths ->
the flax U-Net/PostNet tree (reference common/model/unet.py:123-186,
postnet.py:6-17).

The torch Adam moments are not mapped onto optax; instead a freshly
initialized optax state is written with each checkpoint, so imported runs
are RESUMABLE — continued training simply restarts the moments cold.

Usage:
  python scripts/import_torch_checkpoint.py -ref_model_dir <.../model_xxx> \
      -out_model_dir <.../model_xxx_tpu>
"""
import argparse
import glob
import json
import os
import re
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if __package__ in (None, "") and REPO_ROOT not in sys.path:
    # bare-checkout script mode (python scripts/<name>.py); installed, this
    # module is rcu_tpu.tools.<name> and needs no path setup
    sys.path.insert(0, REPO_ROOT)

from rcu_tpu.engine import checkpoint as ckpt_lib  # noqa: E402
from rcu_tpu.engine.config import ParametricNode  # noqa: E402


def _np(tensor):
    return np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                      else tensor)


def _conv(sd, prefix):
    # torch Conv2d OIHW -> flax HWIO
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{prefix}.bias"])}


def _cbr(sd, prefix):
    """torch Conv2dBnRelu -> flax ConvBnRelu (params, batch_stats)."""
    params = {"Conv_0": _conv(sd, f"{prefix}.conv2d_batch_relu.conv")}
    stats = {}
    bn = f"{prefix}.conv2d_batch_relu.bn"
    if f"{bn}.weight" in sd:
        params["BatchNorm_0"] = {"scale": _np(sd[f"{bn}.weight"]),
                                 "bias": _np(sd[f"{bn}.bias"])}
        stats["BatchNorm_0"] = {"mean": _np(sd[f"{bn}.running_mean"]),
                                "var": _np(sd[f"{bn}.running_var"])}
    return params, stats


def _block(sd, prefix):
    """torch ConvBlock / ConvResidualBlock -> (flax class name, params,
    batch_stats). Residual blocks carry a ``<prefix>.residual`` 1x1 conv,
    which flax names ``Conv_0`` inside ``ConvResidualBlock_*``."""
    params, stats = {}, {}
    name = "ConvBlock"
    if f"{prefix}.residual.weight" in sd:
        name = "ConvResidualBlock"
        params["Conv_0"] = _conv(sd, f"{prefix}.residual")
    j = 0
    while f"{prefix}.block.{j}.conv2d_batch_relu.conv.weight" in sd:
        p, s = _cbr(sd, f"{prefix}.block.{j}")
        params[f"ConvBnRelu_{j}"] = p
        if s:
            stats[f"ConvBnRelu_{j}"] = s
        j += 1
    if j == 0:
        raise ValueError(f"no Conv2dBnRelu children under '{prefix}.block' — "
                         "not a reference ConvBlock state_dict")
    return name, params, stats


def unet_state_dict_to_trees(sd):
    """Reference UNet state_dict -> (params, batch_stats) flax trees. The
    layout mirrors tests/test_model_weight_parity.py::transplant, but works
    from the serialized keys alone (no torch model instantiation)."""
    params, stats = {}, {}
    counters = {}

    def add_block(prefix):
        name, p, s = _block(sd, prefix)
        n = counters.get(name, 0)
        counters[name] = n + 1
        params[f"{name}_{n}"] = p
        stats[f"{name}_{n}"] = s

    i = 0
    while f"down_convs.{i}.block.block.0.conv2d_batch_relu.conv.weight" in sd:
        add_block(f"down_convs.{i}.block")
        i += 1
    add_block("bottom_convs")
    k = 0
    while f"up_convs.{k}.upconv.1.weight" in sd:
        params[f"Conv_{k}"] = _conv(sd, f"up_convs.{k}.upconv.1")
        add_block(f"up_convs.{k}.block")
        k += 1
    depth = k  # head's 1x1 conv takes the next index after the k upconvs
    p, s = _cbr(sd, "conv_cls.0")
    params["ConvBnRelu_0"] = p
    stats["ConvBnRelu_0"] = s
    params[f"Conv_{depth}"] = _conv(sd, "conv_cls.1")
    if "conv_sigma.0.conv2d_batch_relu.conv.weight" in sd:
        p, s = _cbr(sd, "conv_sigma.0")
        params["ConvBnRelu_1"] = p
        stats["ConvBnRelu_1"] = s
        params[f"Conv_{depth + 1}"] = _conv(sd, "conv_sigma.1")
    return params, stats


def postnet_state_dict_to_trees(sd):
    """Reference PostNet state_dict -> (params, batch_stats) flax trees."""
    params, stats = {}, {}
    j = 0
    while f"convs.{j}.conv2d_batch_relu.conv.weight" in sd:
        p, s = _cbr(sd, f"convs.{j}")
        params[f"ConvBnRelu_{j}"] = p
        if s:
            stats[f"ConvBnRelu_{j}"] = s
        j += 1
    params["Conv_0"] = _conv(sd, "conv_logits")
    return params, stats


_CONVERTERS = {"unet": unet_state_dict_to_trees,
               "postnet": postnet_state_dict_to_trees}

# reference checkpoint[-postfix]_ep###[-best].pth (management.py:103-133)
_CKPT_RE = re.compile(
    r"checkpoint(?:-(?P<postfix>.+?))?_ep(?P<epoch>\d+)(?P<best>-best)?\.pth$")


def _load_model_doc(ref_model_dir: str, postfix: str) -> dict:
    """model.json for the main model, model-<postfix>.json for additional
    models of a multi-model run (reference multimodelcontext.py)."""
    name = f"model-{postfix}.json" if postfix else "model.json"
    path = os.path.join(ref_model_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint postfix '{postfix}' has no matching {name} in "
            f"{ref_model_dir} — cannot determine its architecture")
    with open(path) as f:
        return json.load(f)


def _converter_for(doc: dict):
    model_type = doc["model"]["type"]
    if model_type not in _CONVERTERS:
        raise ValueError(f'cannot convert model type "{model_type}" '
                         f"(supported: {sorted(_CONVERTERS)})")
    return _CONVERTERS[model_type]


def import_model_dir(ref_model_dir: str, out_model_dir: str) -> list:
    """Convert model.json(s) + every checkpoint; returns the written paths.
    Postfixed checkpoints (multi-model runs) are converted with the
    architecture recorded in their own model-<postfix>.json."""
    import torch

    main_doc = _load_model_doc(ref_model_dir, "")
    _converter_for(main_doc)  # validate the main type upfront

    out_files = ckpt_lib.ModelFiles.from_model_dir(out_model_dir)
    ckpt_lib.backup_model_parameters(
        out_files,
        ParametricNode(main_doc["model"]["type"],
                       main_doc["model"].get("params", {})),
        ParametricNode(main_doc["optimizer"]["type"],
                       main_doc["optimizer"].get("params", {}))
        if main_doc.get("optimizer") else None)

    from rcu_tpu.models import get_optimizer
    written = []
    docs = {"": main_doc}
    pattern = os.path.join(ref_model_dir, "checkpoints", "checkpoint*.pth")
    for path in sorted(glob.glob(pattern)):
        m = _CKPT_RE.search(os.path.basename(path))
        if not m:
            print(f"skipping unrecognized checkpoint name: {path}")
            continue
        postfix = m["postfix"] or ""
        if postfix not in docs:
            docs[postfix] = _load_model_doc(ref_model_dir, postfix)
            # preserve the aux model's architecture record so the converted
            # dir is self-contained (ckpt_lib.load_model_parameters reads
            # model-<postfix>.json for postfixed checkpoints)
            with open(os.path.join(out_model_dir,
                                   f"model-{postfix}.json"), "w") as f:
                json.dump({"model": docs[postfix]["model"],
                           "optimizer": docs[postfix].get("optimizer")},
                          f, indent=2)
        doc = docs[postfix]
        convert = _converter_for(doc)
        payload = torch.load(path, map_location="cpu")
        params, batch_stats = convert(payload["state_dict"])
        # a fresh optimizer state makes the checkpoint RESUMABLE (the torch
        # Adam moments don't map onto optax); training continues with
        # re-initialized moments, exactly like a cold optimizer start
        opt_state = None
        if doc.get("optimizer"):
            optimizer = get_optimizer(doc["optimizer"]["type"],
                                      doc["optimizer"].get("params", {}))
            opt_state = optimizer.init(params)
        best_score = payload.get("best_score")  # None pre-first-validation
        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state,
                 "epoch": np.int32(payload.get("epoch", int(m["epoch"]))),
                 # -inf is the engine's "no best yet" sentinel (train.py maps
                 # non-finite back to None on resume); 0.0 would wrongly beat
                 # a first validation scoring exactly 0
                 "best_score": np.float32(
                     -np.inf if best_score is None else best_score)}
        written.append(ckpt_lib.save_checkpoint(
            out_files, state, int(m["epoch"]), best=bool(m["best"]),
            postfix=postfix))
    if not written:
        raise FileNotFoundError(f"no checkpoints matched {pattern}")
    return written


def main():
    parser = argparse.ArgumentParser(
        description="Convert a reference (torch) model dir to rcu_tpu format")
    parser.add_argument("-ref_model_dir", type=str, required=True,
                        help="reference model_<id> dir (model.json + checkpoints/)")
    parser.add_argument("-out_model_dir", type=str, required=True,
                        help="destination rcu_tpu model dir")
    args = parser.parse_args()
    written = import_model_dir(args.ref_model_dir, args.out_model_dir)
    for path in written:
        print(f"wrote {path}")
    print(f"converted {len(written)} checkpoint(s); point test configs' "
          f"model_dir at {args.out_model_dir}")


def cli():
    main()


if __name__ == "__main__":
    cli()
