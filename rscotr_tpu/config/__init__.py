from rscotr_tpu.config.config import (Config, ConfigDict, DictAction,
                                      deep_merge, parse_cfg_option_value,
                                      replace_cfg_vals)
from rscotr_tpu.config.registry import (BACKBONES, DATASETS, HEADS, HOOKS,
                                        MODELS, NECKS, OPTIMIZER_BUILDERS,
                                        PIPELINES, STRATEGIES, TRANSFORMERS,
                                        Registry)

__all__ = [
    "Config", "ConfigDict", "DictAction", "deep_merge",
    "parse_cfg_option_value", "replace_cfg_vals", "Registry",
    "MODELS", "BACKBONES", "NECKS", "HEADS", "TRANSFORMERS", "DATASETS",
    "PIPELINES", "STRATEGIES", "HOOKS", "OPTIMIZER_BUILDERS",
]
