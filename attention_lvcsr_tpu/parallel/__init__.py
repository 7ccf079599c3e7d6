"""Multi-chip parallelism: mesh construction and sharded train steps."""
from attention_lvcsr_tpu.parallel.mesh import (  # noqa: F401
    batch_shardings, make_mesh, make_parallel_train_step,
    param_partition_spec, shard_batch, shard_params)
