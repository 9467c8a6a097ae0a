"""ISIC test script (auxiliary_segm) entry point (isic, auxiliary_segm strategy).

TPU-native counterpart of the reference script ``bin-dl/isic_test_auxiliary_segm.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.test_auxiliary_segm``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'auxiliary_segm': 'test_isic_auxiliary_segm.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'auxiliary_segm')
    from rcu_tpu import strategies
    config = _cli.load_test_config(config_file)
    return strategies.test_auxiliary_segm(config, mesh=_cli.mesh_from_devices(devices), symlink_inputs=True)


def cli():
    _cli.run_main(main, 'ISIC test script (auxiliary_segm)')


if __name__ == "__main__":
    cli()
