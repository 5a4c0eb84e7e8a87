from rscotr_tpu.ops.box_ops import (bbox_cxcywh_to_xyxy, bbox_overlaps,
                                    bbox_xyxy_to_cxcywh, inverse_sigmoid)
from rscotr_tpu.ops.losses import (accuracy, dice_loss, giou_loss, l1_loss,
                                   label_smooth_loss, sigmoid_focal_loss,
                                   softmax_cross_entropy)
from rscotr_tpu.ops.matcher import (bbox_l1_cost, focal_loss_cost, hungarian,
                                    hungarian_batched, iou_cost)
from rscotr_tpu.ops.ms_deform_attn import ms_deform_attn
from rscotr_tpu.ops.point_generator import (encoder_reference_points,
                                            level_start_indices,
                                            normalized_grid_reference_points,
                                            single_level_grid_points)
from rscotr_tpu.ops.pos_encoding import (coordinate_sine_embedding,
                                         sine_positional_encoding)

__all__ = [
    "bbox_cxcywh_to_xyxy", "bbox_xyxy_to_cxcywh", "bbox_overlaps",
    "inverse_sigmoid", "sigmoid_focal_loss", "l1_loss", "giou_loss",
    "softmax_cross_entropy", "label_smooth_loss", "accuracy", "dice_loss",
    "hungarian", "hungarian_batched", "focal_loss_cost", "bbox_l1_cost",
    "iou_cost", "ms_deform_attn", "sine_positional_encoding",
    "coordinate_sine_embedding", "single_level_grid_points",
    "normalized_grid_reference_points", "encoder_reference_points",
    "level_start_indices",
]
