"""Shared CLI plumbing for the bin/ entry scripts.

Mirrors the reference's per-script skeleton (``main(config_file, config_id)``
with ``-config_file``/``-config_id`` argparse, default yaml resolution by id,
try/except logging wrapper — e.g. bin-dl/brats_train_default.py:17-84).
"""
import argparse
import logging
import os
import sys

if __package__ in (None, ""):
    # bare-checkout script mode (python bin/<name>.py): make the repo-root
    # rcu_tpu package importable. Installed (pip install -e .), this module
    # is rcu_tpu.cli._cli and no path setup is needed.
    REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)

if os.environ.get("RCU_PLATFORM"):
    # backend override for the entry scripts, e.g. RCU_PLATFORM=cpu with
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 to exercise
    # `-devices N` sharding on a virtual CPU mesh without N real chips
    # (a plain JAX_PLATFORMS env var is ignored when a sitecustomize has
    # already pinned the platform, so set the jax config explicitly)
    import jax
    jax.config.update("jax_platforms", os.environ["RCU_PLATFORM"])

from rcu_tpu import directories as dirs  # noqa: E402
from rcu_tpu.engine import config as cfg_lib  # noqa: E402


def resolve_config(config_file, config_id, default_map: dict, default_id: str):
    """config_file wins; else config_id -> yaml in CONFIG_DIR (reference
    brats_train_default.py:20-37)."""
    if config_file:
        return config_file
    cid = config_id or default_id
    if cid not in default_map:
        raise ValueError(f'unknown config id "{cid}"; known: {sorted(default_map)}')
    return os.path.join(dirs.CONFIG_DIR, default_map[cid])


def mesh_from_devices(devices):
    """-devices N -> a 1-D data mesh over the first N devices (None -> no mesh)."""
    if not devices or devices <= 1:
        return None
    from rcu_tpu.parallel import mesh as mesh_lib
    return mesh_lib.make_mesh(n_devices=devices)


def run_main(main_fn, description: str, with_config_id: bool = True):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("-config_file", type=str, nargs="?",
                        help="yaml file containing the configuration")
    if with_config_id:
        parser.add_argument("-config_id", type=str, nargs="?",
                            help="config id resolving to a default yaml")
    parser.add_argument("-devices", type=int, nargs="?", default=None,
                        help="run sharded over the first N devices "
                             "(default: single device)")
    args = parser.parse_args()
    try:
        if with_config_id:
            main_fn(args.config_file, args.config_id, devices=args.devices)
        else:
            main_fn(args.config_file, devices=args.devices)
    except Exception:
        logging.exception("")
        raise


def load_train_config(path) -> "cfg_lib.TrainConfiguration":
    return cfg_lib.load(path, expected_type="train-config")


def load_test_config(path) -> "cfg_lib.TestConfiguration":
    return cfg_lib.load(path, expected_type="test-config")
