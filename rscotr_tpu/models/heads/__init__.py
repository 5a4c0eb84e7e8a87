from rscotr_tpu.models.heads.cdn import (CdnConfig, cdn_self_attn_mask,
                                         cdn_targets, generate_cdn_queries)
from rscotr_tpu.models.heads.cls_heads import MlvlClsHead, SlvlClsHead
from rscotr_tpu.models.heads.dino_head import DINOHead
from rscotr_tpu.models.heads.dino_loss import (DetLossConfig, dino_get_bboxes,
                                               dino_loss, loss_single_layer)
from rscotr_tpu.models.heads.mask2former_head import Mask2FormerHead
from rscotr_tpu.models.heads.pixel_decoders import (MlvlClsPixelDecoder,
                                                    MlvlSegPixelDecoder)

__all__ = [
    "SlvlClsHead", "MlvlClsHead", "DINOHead", "Mask2FormerHead",
    "MlvlClsPixelDecoder", "MlvlSegPixelDecoder", "CdnConfig",
    "cdn_self_attn_mask", "cdn_targets", "generate_cdn_queries",
    "DetLossConfig", "dino_loss", "dino_get_bboxes", "loss_single_layer",
]
