"""Box utilities (JAX).

Behavioral reference: mmdet bbox transforms used throughout the reference's
DETR heads (bbox_cxcywh_to_xyxy / bbox_xyxy_to_cxcywh, bbox_overlaps GIoU
mode, inverse_sigmoid with eps=1e-3 as in
/root/reference/models/multi/bbox_head/transformer.py:117 and
dino_head.py:141).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def bbox_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """logit with clamping; reference uses eps=1e-3 everywhere in DINO."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)


def bbox_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b[..., 2] - b[..., 0], 0.0, None) * \
        jnp.clip(b[..., 3] - b[..., 1], 0.0, None)


def bbox_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  mode: str = "iou", is_aligned: bool = False,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise (or aligned) IoU / GIoU between xyxy boxes.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M), or (..., N)
    when is_aligned.
    """
    assert mode in ("iou", "giou")
    if not is_aligned:
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
    else:
        b1, b2 = boxes1, boxes2
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = bbox_area(b1)
    area2 = bbox_area(b2)
    union = area1 + area2 - inter
    union = jnp.maximum(union, eps)
    iou = inter / union
    if mode == "iou":
        return iou
    lt_e = jnp.minimum(b1[..., :2], b2[..., :2])
    rb_e = jnp.maximum(b1[..., 2:], b2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0, None)
    enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
    return iou - (enclose - union) / enclose
