"""Utilities: run ids, logging, label helpers, background writer pool."""
from rcu_tpu.utils import ids, labels, logs, writerpool  # noqa: F401
from rcu_tpu.utils.writerpool import WriterPool  # noqa: F401
