from genmmrec_tpu.parallel.mesh import (
    build_mesh,
    data_sharding,
    model_axis_size,
    replicated,
    shard_model_params,
    shard_pytree,
    sharded_topk,
)
