"""Checkpoint service: reference dir schema with flax msgpack payloads.

Parity target: ``common/model/management.py:14-164``. Directory layout::

    <train_dir>/<run_id>_<name>/model_<run_id>/
        model.json                          # arch + optimizer record
        checkpoints/checkpoint_ep{:03d}.ckpt
        checkpoints/checkpoint_ep{:03d}-best.ckpt
        checkpoints/checkpoint-<postfix>_ep{:03d}.ckpt   # multi-model runs

Addressing: 'best' | 'last' | int epoch (reference management.py:103-133).
Payload: msgpack of {params, batch_stats, opt_state, epoch, best_score} via
flax.serialization (restored template-free with msgpack_restore; opt_state is
re-templated by the caller when resuming).
"""
from __future__ import annotations

import glob
import json
import os
import re

import jax
import numpy as np
from flax import serialization

CHECKPOINT_PLACEHOLDER = "checkpoint{postfix}_ep{epoch:03d}{best}.ckpt"


class ModelFiles:
    """Path schema around one model dir (reference management.py:14-51)."""

    def __init__(self, model_dir: str):
        self.model_dir = model_dir

    @classmethod
    def from_model_dir(cls, model_dir: str) -> "ModelFiles":
        return cls(model_dir)

    @classmethod
    def create(cls, train_run_dir: str, run_id: str) -> "ModelFiles":
        return cls(os.path.join(train_run_dir, f"model_{run_id}"))

    @property
    def weight_checkpoint_dir(self) -> str:
        return os.path.join(self.model_dir, "checkpoints")

    @property
    def model_path(self) -> str:
        return os.path.join(self.model_dir, "model.json")

    def model_path_for(self, postfix: str = "") -> str:
        """model.json, or model-<postfix>.json for a multi-model run's
        additional models (reference multimodelcontext.py postfixes)."""
        name = f"model-{postfix}.json" if postfix else "model.json"
        return os.path.join(self.model_dir, name)

    def build_checkpoint_path(self, epoch: int, best: bool = False,
                              postfix: str = "") -> str:
        name = CHECKPOINT_PLACEHOLDER.format(
            postfix=f"-{postfix}" if postfix else "", epoch=epoch,
            best="-best" if best else "")
        return os.path.join(self.weight_checkpoint_dir, name)


def backup_model_parameters(model_files: ModelFiles, model_node, optimizer_node):
    """Write model.json ONCE (reference management.py:90-94); model/optimizer
    nodes are ``(type, params)`` pairs from the config. A resume with an
    edited config must not silently replace the historical architecture
    record that test-time load_model_parameters relies on."""
    os.makedirs(model_files.model_dir, exist_ok=True)
    if os.path.exists(model_files.model_path):
        return
    with open(model_files.model_path, "w") as f:
        json.dump({"model": {"type": model_node.type, "params": model_node.params},
                   "optimizer": {"type": optimizer_node.type,
                                 "params": optimizer_node.params}
                   if optimizer_node is not None else None}, f, indent=2)


def load_model_parameters(model_files: ModelFiles, postfix: str = ""):
    with open(model_files.model_path_for(postfix), "r") as f:
        d = json.load(f)
    from rcu_tpu.engine.config import ParametricNode
    model = ParametricNode(d["model"]["type"], d["model"]["params"])
    optimizer = None
    if d.get("optimizer"):
        optimizer = ParametricNode(d["optimizer"]["type"], d["optimizer"]["params"])
    return model, optimizer


def save_checkpoint(model_files: ModelFiles, state: dict, epoch: int,
                    best: bool = False, postfix: str = ""):
    """state: pytree dict (params/batch_stats/opt_state/epoch/best_score...)."""
    os.makedirs(model_files.weight_checkpoint_dir, exist_ok=True)
    path = model_files.build_checkpoint_path(epoch, best, postfix)
    state = jax.device_get(state)
    # write-then-rename: a crash mid-write must never leave a truncated
    # checkpoint at the final path (test_at: best would then fail to restore)
    tmp_path = path + ".tmp"
    with open(tmp_path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(state)))
    os.replace(tmp_path, path)
    return path


def load_checkpoint(path: str, template=None):
    """Restore a checkpoint; template-free returns plain nested dicts."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is not None:
        return serialization.from_state_dict(template, raw)
    return raw


_EPOCH_RE = re.compile(r"_ep(\d+)(-best)?\.ckpt$")


def find_checkpoint_files(model_files: ModelFiles, postfix: str = ""):
    prefix = f"checkpoint-{postfix}_" if postfix else "checkpoint_"
    pattern = os.path.join(model_files.weight_checkpoint_dir, prefix + "ep*.ckpt")
    return sorted(glob.glob(pattern))


def find_best_checkpoint_epoch(model_files: ModelFiles, postfix: str = ""):
    """Epoch of the -best checkpoint; the HIGHEST epoch when several exist.

    SaveBestModelHook deliberately saves the new best before deleting the
    old one (crash safety), so a crash inside that window leaves two -best
    files. best_score is monotone within a run, so the newest epoch is the
    true best — returning the first (lexicographically oldest) would pin
    'best' to the stale model forever."""
    best = None
    for path in find_checkpoint_files(model_files, postfix):
        m = _EPOCH_RE.search(path)
        if m and m.group(2):
            epoch = int(m.group(1))
            best = epoch if best is None else max(best, epoch)
    return best


def find_epoch_checkpoints(model_files: ModelFiles, postfix: str = ""):
    """Sorted list of epochs with a plain (non-best) checkpoint on disk."""
    epochs = []
    for path in find_checkpoint_files(model_files, postfix):
        m = _EPOCH_RE.search(path)
        if m and not m.group(2):
            epochs.append(int(m.group(1)))
    return sorted(epochs)


def find_last_checkpoint_epoch(model_files: ModelFiles, postfix: str = ""):
    epochs = find_epoch_checkpoints(model_files, postfix)
    return epochs[-1] if epochs else None


def find_checkpoint_file(model_files: ModelFiles, at, postfix: str = ""):
    """at: 'best' | 'last' | int epoch -> existing checkpoint path or None."""
    if at == "best":
        epoch = find_best_checkpoint_epoch(model_files, postfix)
        if epoch is None:
            return None
        return model_files.build_checkpoint_path(epoch, best=True, postfix=postfix)
    if at == "last":
        epoch = find_last_checkpoint_epoch(model_files, postfix)
        if epoch is None:
            return None
        return model_files.build_checkpoint_path(epoch, best=False, postfix=postfix)
    path = model_files.build_checkpoint_path(int(at), best=False, postfix=postfix)
    return path if os.path.exists(path) else None


def delete_checkpoint(model_files: ModelFiles, epoch: int, best: bool = False,
                      postfix: str = ""):
    path = model_files.build_checkpoint_path(epoch, best, postfix)
    if os.path.exists(path):
        os.remove(path)
