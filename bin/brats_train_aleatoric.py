"""BRATS train script (aleatoric) entry point (brats, aleatoric strategy).

TPU-native counterpart of the reference script ``bin-dl/brats_train_aleatoric.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.train_aleatoric``.
"""
import _cli


DEFAULT_CONFIGS = {'aleatoric': 'train_brats_aleatoric.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'aleatoric')
    from rcu_tpu import strategies
    config = _cli.load_train_config(config_file)
    return strategies.train_aleatoric(config, mesh=_cli.mesh_from_devices(devices))


if __name__ == "__main__":
    _cli.run_main(main, 'BRATS train script (aleatoric)')
