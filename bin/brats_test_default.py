"""BRATS test script (default) entry point (brats, default strategy).

TPU-native counterpart of the reference script ``bin-dl/brats_test_default.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.test_default``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'baseline': 'test_brats_baseline.yaml', 'baseline_mc': 'test_brats_baseline_mc.yaml', 'center': 'test_brats_center.yaml', 'center_mc': 'test_brats_center_mc.yaml', 'cv0': 'baseline_cv/test_brats_baseline_cv0.yaml', 'cv1': 'baseline_cv/test_brats_baseline_cv1.yaml', 'cv2': 'baseline_cv/test_brats_baseline_cv2.yaml', 'cv3': 'baseline_cv/test_brats_baseline_cv3.yaml', 'cv4': 'baseline_cv/test_brats_baseline_cv4.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'baseline')
    from rcu_tpu import strategies
    config = _cli.load_test_config(config_file)
    return strategies.test_default(config, mesh=_cli.mesh_from_devices(devices))


def cli():
    _cli.run_main(main, 'BRATS test script (default)')


if __name__ == "__main__":
    cli()
