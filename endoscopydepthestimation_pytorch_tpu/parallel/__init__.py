from .mesh import (DATA_AXIS, batch_sharding, device_prefetch,  # noqa: F401
                   host_local, host_local_rows, make_mesh, make_mesh_for_batch,
                   make_parallel_eval_step, make_parallel_predict_step,
                   make_parallel_train_step, make_shardmap_train_step,
                   multihost_barrier, pad_batch_to, replicate_state,
                   replicated, shard_batch)
