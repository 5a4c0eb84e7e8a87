from rscotr_tpu.parallel.mesh import (batch_sharded, initialize_distributed,
                                      make_mesh, pad_batch_to_devices,
                                      replicate_global, replicated,
                                      shard_batch, shard_params)
from rscotr_tpu.parallel.fsdp import (describe_fsdp, fsdp_param_specs,
                                      shard_opt_state_fsdp,
                                      shard_params_fsdp)
from rscotr_tpu.parallel.tp import (describe_tp, make_mesh_2d,
                                    shard_opt_state_tp, shard_params_tp,
                                    tp_param_specs)

__all__ = ["make_mesh", "replicated", "replicate_global", "batch_sharded",
           "shard_params",
           "shard_batch", "pad_batch_to_devices", "initialize_distributed",
           "make_mesh_2d", "tp_param_specs", "shard_params_tp",
           "shard_opt_state_tp", "describe_tp",
           "fsdp_param_specs", "shard_params_fsdp", "shard_opt_state_fsdp",
           "describe_fsdp"]
