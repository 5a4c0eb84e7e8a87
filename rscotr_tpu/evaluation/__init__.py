from rscotr_tpu.evaluation.accuracy import confusion_matrix, top_k_accuracy
from rscotr_tpu.evaluation.coco_map import bbox_iou_xyxy, eval_map
from rscotr_tpu.evaluation.seg_metrics import (evaluate_seg,
                                               intersect_and_union,
                                               total_metrics)

__all__ = ["top_k_accuracy", "confusion_matrix", "eval_map",
           "bbox_iou_xyxy", "intersect_and_union", "total_metrics",
           "evaluate_seg"]
