from rscotr_tpu.parallel.mesh import (batch_sharded, initialize_distributed,
                                      make_mesh, pad_batch_to_devices,
                                      replicated, shard_batch, shard_params)

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_params",
           "shard_batch", "pad_batch_to_devices", "initialize_distributed"]
