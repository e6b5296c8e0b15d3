from genmmrec_tpu.parallel.mesh import build_mesh, data_sharding, replicated, shard_pytree
