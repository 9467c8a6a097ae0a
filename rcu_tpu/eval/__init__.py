"""Offline uncertainty evaluation engine (reference bin-eval + rechun/eval)."""
from rcu_tpu.eval import actions, analysis, evaldata, hooks, kernels  # noqa: F401
