"""Mesh + sharding (TPU-native data parallelism over ICI)."""
from rcu_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, batch_sharding, make_mesh, pad_batch_size_to_mesh, replicated,
    shard_batch, shard_train_step)
