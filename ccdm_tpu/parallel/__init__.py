from ccdm_tpu.parallel.mesh import create_mesh, replicated, batch_sharded, shard_batch, constrain_batch
