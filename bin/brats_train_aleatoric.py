"""BRATS train script (aleatoric) entry point (brats, aleatoric strategy).

TPU-native counterpart of the reference script ``bin-dl/brats_train_aleatoric.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.train_aleatoric``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'aleatoric': 'train_brats_aleatoric.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'aleatoric')
    from rcu_tpu import strategies
    config = _cli.load_train_config(config_file)
    return strategies.train_aleatoric(config, mesh=_cli.mesh_from_devices(devices))


def cli():
    _cli.run_main(main, 'BRATS train script (aleatoric)')


if __name__ == "__main__":
    cli()
