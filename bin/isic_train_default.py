"""ISIC train script (default) entry point (isic, default strategy).

TPU-native counterpart of the reference script ``bin-dl/isic_train_default.py``:
resolves a config id to its default yaml, then delegates to
``rcu_tpu.strategies.train_default``.
"""
try:  # package mode: rcu_tpu.cli.* (console entry points)
    from . import _cli
except ImportError:  # bare-checkout script mode: python bin/<name>.py
    import _cli


DEFAULT_CONFIGS = {'baseline': 'train_isic_baseline.yaml', 'center': 'train_isic_center.yaml', 'cv0': 'baseline_cv/train_isic_baseline_cv0.yaml', 'cv1': 'baseline_cv/train_isic_baseline_cv1.yaml', 'cv2': 'baseline_cv/train_isic_baseline_cv2.yaml', 'cv3': 'baseline_cv/train_isic_baseline_cv3.yaml', 'cv4': 'baseline_cv/train_isic_baseline_cv4.yaml', 'ensemble0': 'train_ensemble/train_isic_ensemble_0.yaml', 'ensemble1': 'train_ensemble/train_isic_ensemble_1.yaml', 'ensemble2': 'train_ensemble/train_isic_ensemble_2.yaml', 'ensemble3': 'train_ensemble/train_isic_ensemble_3.yaml', 'ensemble4': 'train_ensemble/train_isic_ensemble_4.yaml', 'ensemble5': 'train_ensemble/train_isic_ensemble_5.yaml', 'ensemble6': 'train_ensemble/train_isic_ensemble_6.yaml', 'ensemble7': 'train_ensemble/train_isic_ensemble_7.yaml', 'ensemble8': 'train_ensemble/train_isic_ensemble_8.yaml', 'ensemble9': 'train_ensemble/train_isic_ensemble_9.yaml'}


def main(config_file, config_id=None, devices=None):
    config_file = _cli.resolve_config(config_file, config_id, DEFAULT_CONFIGS,
                                      'baseline')
    from rcu_tpu import strategies
    config = _cli.load_train_config(config_file)
    # ISIC validates with SmoothDice+Nll (reference isic_train_default.py:57-74)
    return strategies.train_default(
        config, mesh=_cli.mesh_from_devices(devices), eval_subject_fn=strategies.isic_eval_subject_fn)


def cli():
    _cli.run_main(main, 'ISIC train script (default)')


if __name__ == "__main__":
    cli()
