"""Positional encodings (JAX, NHWC).

Behavioral reference:
* mmcv ``SinePositionalEncoding`` — used with num_feats=128, normalize=True,
  temperature 20 (det head) / 10000 (seg pixel decoder & decoder), see
  /root/reference/configs/multi/MTL_slvlcls_...py:100-103,126-136.
* ``gen_sineembed_for_position`` — the DINO decoder's reference-box sine
  embedding (/root/reference/models/multi/bbox_head/transformer.py:45-77),
  temperature 10000, 128 feats per coordinate, output order (y, x, w, h).

All functions are pure and static-shaped.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def sine_positional_encoding(mask: jnp.ndarray,
                             num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = False,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6,
                             offset: float = 0.0) -> jnp.ndarray:
    """mmcv-semantics sine positional encoding.

    Args:
        mask: (B, H, W) bool, True at PADDED positions (mmcv convention).
    Returns:
        (B, H, W, 2*num_feats) float32 — first num_feats channels encode y,
        then x, sin/cos interleaved within each (mmcv channel order, moved
        to NHWC).
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    pos_x = x_embed[..., None] / dim_t          # (B,H,W,num_feats)
    pos_y = y_embed[..., None] / dim_t
    # interleave sin(even), cos(odd)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def coordinate_sine_embedding(pos: jnp.ndarray,
                              num_feats: int = 128,
                              temperature: float = 10000.0) -> jnp.ndarray:
    """DINO decoder reference-box sine embedding.

    Args:
        pos: (..., 2) or (..., 4) normalized coordinates (cx, cy[, w, h]).
    Returns:
        (..., num_feats * pos.shape[-1]) in reference order (y, x[, w, h]).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    def embed(coord: jnp.ndarray) -> jnp.ndarray:
        e = (coord * scale)[..., None] / dim_t          # (..., num_feats)
        return jnp.stack([jnp.sin(e[..., 0::2]), jnp.cos(e[..., 1::2])],
                         axis=-1).reshape(*e.shape[:-1], -1)

    pos_x = embed(pos[..., 0])
    pos_y = embed(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    if pos.shape[-1] == 4:
        pos_w = embed(pos[..., 2])
        pos_h = embed(pos[..., 3])
        return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)
    raise ValueError(f"unsupported coord dim {pos.shape[-1]}")
