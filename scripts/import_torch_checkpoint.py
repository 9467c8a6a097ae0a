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

Optimizer state is NOT converted (torch Adam moments don't map onto optax
pytrees) — imported checkpoints serve testing/inference and best/last
selection; to continue training, resume re-initializes the optimizer.

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
if REPO_ROOT not in sys.path:
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
    """torch ConvBlock (at ``<prefix>.block.{j}``) -> flax ConvBlock."""
    params, stats = {}, {}
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
    return params, stats


def unet_state_dict_to_trees(sd):
    """Reference UNet state_dict -> (params, batch_stats) flax trees. The
    layout mirrors tests/test_model_weight_parity.py::transplant, but works
    from the serialized keys alone (no torch model instantiation)."""
    params, stats = {}, {}
    nb_blocks = 0
    i = 0
    while f"down_convs.{i}.block.block.0.conv2d_batch_relu.conv.weight" in sd:
        p, s = _block(sd, f"down_convs.{i}.block")
        params[f"ConvBlock_{nb_blocks}"] = p
        stats[f"ConvBlock_{nb_blocks}"] = s
        nb_blocks += 1
        i += 1
    p, s = _block(sd, "bottom_convs")
    params[f"ConvBlock_{nb_blocks}"] = p
    stats[f"ConvBlock_{nb_blocks}"] = s
    nb_blocks += 1
    k = 0
    while f"up_convs.{k}.upconv.1.weight" in sd:
        params[f"Conv_{k}"] = _conv(sd, f"up_convs.{k}.upconv.1")
        p, s = _block(sd, f"up_convs.{k}.block")
        params[f"ConvBlock_{nb_blocks}"] = p
        stats[f"ConvBlock_{nb_blocks}"] = s
        nb_blocks += 1
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
    r"checkpoint(?:-(?P<postfix>[^_]+))?_ep(?P<epoch>\d+)(?P<best>-best)?\.pth$")


def import_model_dir(ref_model_dir: str, out_model_dir: str) -> list:
    """Convert model.json + every checkpoint; returns the written paths."""
    import torch

    with open(os.path.join(ref_model_dir, "model.json")) as f:
        doc = json.load(f)
    model_type = doc["model"]["type"]
    if model_type not in _CONVERTERS:
        raise ValueError(f'cannot convert model type "{model_type}" '
                         f"(supported: {sorted(_CONVERTERS)})")
    convert = _CONVERTERS[model_type]

    out_files = ckpt_lib.ModelFiles.from_model_dir(out_model_dir)
    ckpt_lib.backup_model_parameters(
        out_files,
        ParametricNode(model_type, doc["model"].get("params", {})),
        ParametricNode(doc["optimizer"]["type"],
                       doc["optimizer"].get("params", {}))
        if doc.get("optimizer") else None)

    written = []
    pattern = os.path.join(ref_model_dir, "checkpoints", "checkpoint*.pth")
    for path in sorted(glob.glob(pattern)):
        m = _CKPT_RE.search(os.path.basename(path))
        if not m:
            print(f"skipping unrecognized checkpoint name: {path}")
            continue
        payload = torch.load(path, map_location="cpu")
        params, batch_stats = convert(payload["state_dict"])
        state = {"params": params, "batch_stats": batch_stats,
                 "epoch": np.int32(payload.get("epoch", int(m["epoch"]))),
                 "best_score": np.float32(payload.get("best_score", 0.0))}
        written.append(ckpt_lib.save_checkpoint(
            out_files, state, int(m["epoch"]), best=bool(m["best"]),
            postfix=m["postfix"] or ""))
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


if __name__ == "__main__":
    main()
