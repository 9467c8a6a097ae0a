"""BRATS train script (auxiliary_feat) entry point (brats, auxiliary_feat strategy).

TPU-native counterpart of the reference script ``bin-dl/brats_train_auxiliary_feat.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.train_auxiliary_feat``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'auxiliary_feat': 'train_brats_auxiliary_feat.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'auxiliary_feat')
    from rcu_tpu import strategies
    config = _cli.load_train_config(config_file)
    return strategies.train_auxiliary_feat(config, mesh=_cli.mesh_from_devices(devices))


def cli():
    _cli.run_main(main, 'BRATS train script (auxiliary_feat)')


if __name__ == "__main__":
    cli()
