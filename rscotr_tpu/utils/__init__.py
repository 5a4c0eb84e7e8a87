from rscotr_tpu.utils.logging import (MetricsSink, collect_env,
                                      get_root_logger)
from rscotr_tpu.utils.platform import (honor_jax_platforms_env,
                                       setup_compile_cache)
from rscotr_tpu.utils.rng import RngPool, set_random_seed
from rscotr_tpu.utils.visualize import (draw_cls_result, draw_det_results,
                                        draw_seg_results,
                                        save_eval_visualizations,
                                        seg_palette)

__all__ = ["get_root_logger", "MetricsSink", "collect_env", "RngPool",
           "set_random_seed", "honor_jax_platforms_env",
           "setup_compile_cache", "draw_det_results", "draw_seg_results",
           "draw_cls_result", "save_eval_visualizations", "seg_palette"]
