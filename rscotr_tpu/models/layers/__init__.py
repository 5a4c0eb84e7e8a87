from rscotr_tpu.models.layers.attention import MultiheadAttention
from rscotr_tpu.models.layers.common import (FFN, DropPath, GroupNorm2d, Mlp,
                                             drop_path_rates)
from rscotr_tpu.models.layers.msda import MultiScaleDeformableAttention
from rscotr_tpu.models.layers.transformer import (DeformableEncoder,
                                                  DeformableEncoderLayer,
                                                  DinoDecoderLayer,
                                                  MaskedAttentionDecoderLayer)

__all__ = [
    "MultiheadAttention", "FFN", "DropPath", "GroupNorm2d", "Mlp",
    "drop_path_rates", "MultiScaleDeformableAttention", "DeformableEncoder",
    "DeformableEncoderLayer", "DinoDecoderLayer",
    "MaskedAttentionDecoderLayer",
]
