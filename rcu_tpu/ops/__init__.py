"""Pure-JAX compute kernels: metrics, calibration, uncertainty, preparation, losses."""
from rcu_tpu.ops import calibration, losses, metrics, prepare, uncertainty  # noqa: F401
