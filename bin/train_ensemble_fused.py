"""Fused ensemble training: all K members as ONE sharded program.

TPU-native replacement for running the reference's K separate ensemble jobs
(config/train_ensemble/). Produces K standard run dirs with per-member
checkpoints, directly consumable by ``bin/brats_test_ensemble.py``.

Usage:
  python bin/train_ensemble_fused.py --ds brats          # all 10 members
  python bin/train_ensemble_fused.py --ds isic -k 0 1 2  # a subset
"""
import argparse
import os

try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli  # noqa: F401,E402  (sys.path setup in script mode)
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli  # noqa: F401,E402
from rcu_tpu import directories as dirs


def main(dataset: str, ks=None, use_mesh: bool = True):
    from rcu_tpu.parallel import ensemble as ens_lib
    from rcu_tpu.parallel.mesh import make_mesh
    import jax

    ks = list(ks) if ks else list(range(10))
    configs = []
    for k in ks:
        path = os.path.join(dirs.CONFIG_DIR, "train_ensemble",
                            f"train_{dataset}_ensemble_{k}.yaml")
        configs.append(_cli.load_train_config(path))

    mesh = None
    if use_mesh:
        n = len(jax.devices())
        if n % len(configs) == 0 and n >= len(configs):
            mesh = ens_lib.make_ensemble_mesh(len(configs))
    members = ens_lib.train_ensemble_fused(configs, mesh=mesh)
    for m in members:
        print(f"{m.config.train_name}: best {m.best_score:.4f} -> "
              f"{m.model_files.model_dir}")
    return members


def cli():
    parser = argparse.ArgumentParser(description="fused ensemble training")
    parser.add_argument("--ds", type=str, default="brats")
    parser.add_argument("-k", type=int, nargs="*", default=None,
                        help="member indices (default: all 10)")
    parser.add_argument("--no-mesh", action="store_true")
    args = parser.parse_args()
    main(args.ds, args.k, use_mesh=not args.no_mesh)


if __name__ == "__main__":
    cli()
