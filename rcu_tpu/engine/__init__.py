"""Engine: config, checkpoints, functional steps, train/test loops, hooks."""
from rcu_tpu.engine import (  # noqa: F401
    checkpoint, config, databuild, hooks, state, steps, test, train)
from rcu_tpu.engine.test import TestLoop  # noqa: F401
from rcu_tpu.engine.train import TrainLoop  # noqa: F401
