"""ISIC test script (auxiliary_feat) entry point (isic, auxiliary_feat strategy).

TPU-native counterpart of the reference script ``bin-dl/isic_test_auxiliary_feat.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.test_auxiliary_feat``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'auxiliary_feat': 'test_isic_auxiliary_feat.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'auxiliary_feat')
    from rcu_tpu import strategies
    config = _cli.load_test_config(config_file)
    return strategies.test_auxiliary_feat(config, mesh=_cli.mesh_from_devices(devices), symlink_inputs=True)


def cli():
    _cli.run_main(main, 'ISIC test script (auxiliary_feat)')


if __name__ == "__main__":
    cli()
