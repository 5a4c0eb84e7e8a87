"""Loss functions (JAX, fused XLA elementwise — no kernels needed).

Behavioral reference (semantics, not code):
* mmcv ``SigmoidFocalLoss`` (CUDA) with alpha=0.25, gamma=2 and mmdet
  ``avg_factor`` normalization — reference
  configs/multi/MTL_slvlcls_...py:105-110, detr_head.py:333-416.
* mmdet ``L1Loss`` (loss_weight 5.0) and ``GIoULoss`` (loss_weight 2.0) with
  per-element bbox weights.
* mmseg ``CrossEntropyLoss`` (softmax, ignore_index) used by the seg head;
  mmcls ``LabelSmoothLoss`` (label_smooth_val=0.1, mode='original') used by
  the cls head.

Under pjit data parallelism the batch is global, so mmdet's cross-rank
``reduce_mean(avg_factor)`` is subsumed by computing avg factors over the
global (sharded) batch — no explicit collective needed at this layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray],
            avg_factor: Optional[jnp.ndarray], eps: float = 1e-12):
    if weight is not None:
        loss = loss * weight
    total = jnp.sum(loss)
    if avg_factor is None:
        return total
    return total / jnp.maximum(avg_factor, eps)


def sigmoid_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       alpha: float = 0.25,
                       gamma: float = 2.0,
                       avg_factor: Optional[jnp.ndarray] = None,
                       num_classes: Optional[int] = None) -> jnp.ndarray:
    """Multi-class sigmoid focal loss.

    Args:
        logits: (N, C). labels: (N,) int in [0, C]; label == C means
        background (all-zero one-hot), matching mmdet convention.
        weight: (N,) per-sample weight.
    """
    C = num_classes or logits.shape[-1]
    target = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * \
        jnp.power(pt, gamma)
    # bce with logits, numerically stable
    bce = jnp.maximum(logits, 0) - logits * target + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = (bce * focal_weight).sum(-1)
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            weight: Optional[jnp.ndarray] = None,
            avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    return _reduce(loss, weight, avg_factor)


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray,
              weight: Optional[jnp.ndarray] = None,
              avg_factor: Optional[jnp.ndarray] = None,
              eps: float = 1e-6) -> jnp.ndarray:
    """pred/target: (N, 4) xyxy. weight: (N, 4) or (N,) — a (N,4) weight is
    reduced to its leading column (mmdet takes weight.mean(-1); weights here
    are 0/1 row-constant so this is identical)."""
    from rscotr_tpu.ops.box_ops import bbox_overlaps
    if weight is not None and weight.ndim > 1:
        weight = weight.mean(-1)
    giou = bbox_overlaps(pred, target, mode="giou", is_aligned=True, eps=eps)
    loss = 1.0 - giou
    return _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(logits: jnp.ndarray,
                          labels: jnp.ndarray,
                          ignore_index: int = 255,
                          class_weight: Optional[jnp.ndarray] = None,
                          avg_non_ignore: bool = True) -> jnp.ndarray:
    """Pixel/sample softmax CE with ignore_index (mmseg semantics).

    logits: (..., C); labels: (...) int. Labels equal to ignore_index or
    outside [0, C) are ignored.
    """
    C = logits.shape[-1]
    valid = (labels != ignore_index) & (labels >= 0) & (labels < C)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: at seg shapes
    # ((2,512,512,100) f32) the row gather ran at 1.4 GiB/s (8.4 ms/step,
    # trace 2026-08-17) and its VJP is a scatter; the compare-and-reduce
    # form streams at HBM speed in both directions with identical values.
    onehot = (safe_labels[..., None] ==
              jnp.arange(C, dtype=safe_labels.dtype)).astype(logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = valid.astype(logits.dtype)
    if class_weight is not None:
        w = w * class_weight[safe_labels]
    loss = nll * w
    denom = jnp.sum(w) if avg_non_ignore else jnp.array(
        labels.size, logits.dtype)
    return jnp.sum(loss) / jnp.maximum(denom, 1e-12)


def label_smooth_loss(logits: jnp.ndarray,
                      target: jnp.ndarray,
                      label_smooth_val: float = 0.1,
                      mode: str = "original") -> jnp.ndarray:
    """mmcls LabelSmoothLoss, mode='original'.

    target: (N,) int labels or (N, C) soft targets (mixup/cutmix emit soft).
    original mode: t = t * (1 - eps) + eps / C, then soft CE, mean over batch.
    """
    C = logits.shape[-1]
    if target.ndim == 1:
        target = jax.nn.one_hot(target, C, dtype=logits.dtype)
    if mode == "original":
        target = target * (1.0 - label_smooth_val) + label_smooth_val / C
    elif mode == "classy_vision":
        target = (target + label_smooth_val / C) / (1.0 + label_smooth_val)
    else:
        raise ValueError(f"unknown mode {mode}")
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.sum(target * logp, axis=-1))


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray, topk: int = 1):
    idx = jnp.argsort(logits, axis=-1)[..., ::-1][..., :topk]
    correct = jnp.any(idx == labels[..., None], axis=-1)
    return jnp.mean(correct.astype(jnp.float32)) * 100.0


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
              weight: Optional[jnp.ndarray] = None,
              avg_factor: Optional[jnp.ndarray] = None,
              eps: float = 1e-3) -> jnp.ndarray:
    """Dice loss on sigmoid mask logits (N, ...), standard Mask2Former
    companion loss — provided for the instance-seg capability surface."""
    p = jax.nn.sigmoid(pred).reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1).astype(p.dtype)
    num = 2.0 * jnp.sum(p * t, axis=1)
    den = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    loss = 1.0 - (num + eps) / (den + eps)
    return _reduce(loss, weight, avg_factor)
