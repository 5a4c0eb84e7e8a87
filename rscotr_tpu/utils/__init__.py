from rscotr_tpu.utils.logging import (MetricsSink, collect_env,
                                      get_root_logger)
from rscotr_tpu.utils.platform import (honor_jax_platforms_env,
                                       setup_compile_cache)
from rscotr_tpu.utils.rng import RngPool, set_random_seed

__all__ = ["get_root_logger", "MetricsSink", "collect_env", "RngPool",
           "set_random_seed", "honor_jax_platforms_env",
           "setup_compile_cache"]
