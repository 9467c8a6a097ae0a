"""Pallas TPU kernels for the hot reductions (interpret-mode capable on CPU)."""
from rcu_tpu.ops.pallas.evalstats import fused_eval_stats, fused_subject_eval  # noqa: F401
