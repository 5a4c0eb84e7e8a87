"""Contrastive denoising (CDN) query generation — static shapes.

Capability-equivalent of the reference's ``CdnQueryGenerator``
(/root/reference/models/multi/bbox_head/query_denoising.py:8-201), redesigned
TPU-first:

* GTs arrive padded to MAX_GT with a validity mask; ``single_pad`` is the
  static MAX_GT and ``num_groups = max(num_dn_queries // MAX_GT, 1)`` is
  static, so ``pad_size`` and the attention mask are compile-time constants.
  (The reference sizes groups from the batch's max GT count at runtime —
  the only behavioral deviation; padded slots behave as always-background
  denoising queries exactly like the reference's intra-batch padding slots.)
* Layout matches the reference: group g occupies slots
  [g*2*S, (g+1)*2*S) with positives in the first S and negatives in the
  second S; GT i sits at offset i of each block.
* Label noise: flip to a uniform random class w.p. 0.5 * label_noise_scale.
* Box noise: corner jitter scaled by half-extents; negatives pushed by an
  extra unit (rand_part in [1, 2)), clamp to [0, 1].
* The self-attention mask isolates DN groups from each other and hides all
  DN slots from matching queries (query_denoising.py:176-195).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from rscotr_tpu.ops.box_ops import bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh, \
    inverse_sigmoid


@dataclasses.dataclass(frozen=True)
class CdnConfig:
    num_classes: int
    num_queries: int          # matching queries (600)
    max_gt: int               # static per-image GT cap
    num_dn_queries: int = 100
    label_noise_scale: float = 0.5
    box_noise_scale: float = 1.0
    dynamic: bool = True      # config parity; groups are static regardless

    @property
    def num_groups(self) -> int:
        return max(self.num_dn_queries // self.max_gt, 1)

    @property
    def single_pad(self) -> int:
        return self.max_gt

    @property
    def pad_size(self) -> int:
        return 2 * self.single_pad * self.num_groups


def cdn_self_attn_mask(cfg: CdnConfig) -> np.ndarray:
    """Static (tgt, tgt) bool mask; True = attention NOT allowed."""
    S2 = 2 * cfg.single_pad
    pad = cfg.pad_size
    tgt = pad + cfg.num_queries
    m = np.zeros((tgt, tgt), dtype=bool)
    m[pad:, :pad] = True                       # matching can't see DN
    for g in range(cfg.num_groups):
        lo, hi = g * S2, (g + 1) * S2
        m[lo:hi, :lo] = True                   # can't see earlier groups
        m[lo:hi, hi:pad] = True                # can't see later groups
    return m


def generate_cdn_queries(rng: jax.Array,
                         gt_bboxes_cxcywh_norm: jnp.ndarray,
                         gt_labels: jnp.ndarray,
                         gt_valid: jnp.ndarray,
                         label_embedding: jnp.ndarray,
                         cfg: CdnConfig
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build noised DN label/bbox queries.

    Args:
        gt_bboxes_cxcywh_norm: (B, G, 4) normalized cxcywh (G = max_gt).
        gt_labels: (B, G) int32 (arbitrary at invalid slots).
        gt_valid: (B, G) bool.
        label_embedding: (num_classes, C).
    Returns:
        dn_label_query (B, pad_size, C), dn_bbox_query (B, pad_size, 4)
        (unsigmoided; zero at invalid slots, like the reference's padding).
    """
    B, G, _ = gt_bboxes_cxcywh_norm.shape
    assert G == cfg.max_gt
    ng = cfg.num_groups
    blocks = 2 * ng
    k_label, k_newlab, k_sign, k_part = jax.random.split(rng, 4)

    # (B, blocks, G, ...) replicated GTs
    labels = jnp.broadcast_to(gt_labels[:, None, :], (B, blocks, G))
    boxes = jnp.broadcast_to(gt_bboxes_cxcywh_norm[:, None, :, :],
                             (B, blocks, G, 4))
    valid = jnp.broadcast_to(gt_valid[:, None, :], (B, blocks, G))

    # --- label noise -------------------------------------------------------
    if cfg.label_noise_scale > 0:
        p = jax.random.uniform(k_label, (B, blocks, G))
        new_label = jax.random.randint(k_newlab, (B, blocks, G), 0,
                                       cfg.num_classes)
        labels = jnp.where(p < cfg.label_noise_scale * 0.5, new_label,
                           labels)

    # --- box noise ---------------------------------------------------------
    if cfg.box_noise_scale > 0:
        corners = bbox_cxcywh_to_xyxy(boxes)                   # (B,bl,G,4)
        half = boxes[..., 2:] * 0.5
        diff = jnp.concatenate([half, half], axis=-1)
        sign = jax.random.randint(k_sign, corners.shape, 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(k_part, corners.shape)
        # negative blocks (odd block index) get the extra push
        is_neg = (jnp.arange(blocks) % 2 == 1).astype(jnp.float32)
        part = part + is_neg[None, :, None, None]
        corners = corners + part * sign * diff * cfg.box_noise_scale
        corners = jnp.clip(corners, 0.0, 1.0)
        boxes = bbox_xyxy_to_cxcywh(corners)

    safe_labels = jnp.clip(labels, 0, cfg.num_classes - 1)
    label_q = label_embedding[safe_labels]                     # (B,bl,G,C)
    bbox_q = inverse_sigmoid(boxes, eps=1e-3)
    vmask = valid[..., None]
    label_q = jnp.where(vmask, label_q, 0.0)
    bbox_q = jnp.where(vmask, bbox_q, 0.0)

    C = label_embedding.shape[-1]
    return (label_q.reshape(B, cfg.pad_size, C),
            bbox_q.reshape(B, cfg.pad_size, 4))


def cdn_targets(gt_bboxes_cxcywh_norm: jnp.ndarray,
                gt_labels: jnp.ndarray,
                gt_valid: jnp.ndarray,
                cfg: CdnConfig):
    """DN loss targets over the pad_size slots (reference
    _get_dn_target_single semantics, vectorized, static).

    Returns dict with labels (B, P), label_weights (B, P),
    bbox_targets (B, P, 4), bbox_weights (B, P, 4), num_pos (scalar).
    """
    B, G, _ = gt_bboxes_cxcywh_norm.shape
    blocks = 2 * cfg.num_groups
    # slot (block j, offset i): positive iff j even and gt i valid
    is_pos_block = (jnp.arange(blocks) % 2 == 0)
    valid = jnp.broadcast_to(gt_valid[:, None, :], (B, blocks, G))
    pos = valid & is_pos_block[None, :, None]

    labels = jnp.where(pos,
                       jnp.broadcast_to(gt_labels[:, None, :],
                                        (B, blocks, G)),
                       cfg.num_classes)
    label_weights = jnp.ones((B, blocks, G), jnp.float32)
    boxes = jnp.broadcast_to(gt_bboxes_cxcywh_norm[:, None, :, :],
                             (B, blocks, G, 4))
    bbox_targets = jnp.where(pos[..., None], boxes, 0.0)
    bbox_weights = jnp.broadcast_to(
        pos[..., None].astype(jnp.float32), (B, blocks, G, 4))

    P = cfg.pad_size
    num_pos = jnp.sum(gt_valid.astype(jnp.float32)) * cfg.num_groups
    return dict(
        labels=labels.reshape(B, P),
        label_weights=label_weights.reshape(B, P),
        bbox_targets=bbox_targets.reshape(B, P, 4),
        bbox_weights=bbox_weights.reshape(B, P, 4),
        num_pos=num_pos,
    )
