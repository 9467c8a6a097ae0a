"""Analysis layer: eval-CSV discovery and paper table/figure builders."""
from rcu_tpu.analysis import frames, resultdata  # noqa: F401
