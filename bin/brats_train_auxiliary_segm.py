"""BRATS train script (auxiliary_segm) entry point (brats, auxiliary_segm strategy).

TPU-native counterpart of the reference script ``bin-dl/brats_train_auxiliary_segm.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.train_auxiliary_segm``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'auxiliary_segm': 'train_brats_auxiliary_segm.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'auxiliary_segm')
    from rcu_tpu import strategies
    config = _cli.load_train_config(config_file)
    return strategies.train_auxiliary_segm(config, mesh=_cli.mesh_from_devices(devices))


def cli():
    _cli.run_main(main, 'BRATS train script (auxiliary_segm)')


if __name__ == "__main__":
    cli()
