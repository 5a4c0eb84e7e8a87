"""Multi-level reference point grids (JAX, static shapes).

Behavioral reference:
* mmdet ``MlvlPointGenerator.single_level_grid_priors`` (offset=0.5) as used
  by the pixel decoders (/root/reference/models/multi/cls_head/
  pixel_decoder.py:64-69, seg_head/pixel_decoder.py:101-106): points at
  ``(i + 0.5) * stride`` then normalized by ``(w, h) * stride``.
* ``DeformableDetrTransformer.get_reference_points`` — per-level normalized
  center grids scaled by valid ratios, broadcast to all levels
  (used by the det path through the shared encoder).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def single_level_grid_points(h: int, w: int, stride: int,
                             offset: float = 0.5) -> jnp.ndarray:
    """(h*w, 2) un-normalized (x, y) points at pixel centers * stride."""
    xs = (jnp.arange(w, dtype=jnp.float32) + offset) * stride
    ys = (jnp.arange(h, dtype=jnp.float32) + offset) * stride
    gx, gy = jnp.meshgrid(xs, ys)           # (h, w) each, row-major
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def normalized_grid_reference_points(
        spatial_shapes: Sequence[Tuple[int, int]],
        strides: Sequence[int],
        num_encoder_levels: int) -> jnp.ndarray:
    """Pixel-decoder style reference points, concatenated low->high res.

    ``spatial_shapes``/``strides`` are ordered low->high resolution as fed to
    the encoder (the reference iterates neck levels from the last/smallest,
    see MlvlClsPixelDecoder.forward). Returns (sum_hw, 2) normalized (x, y).
    """
    pts = []
    for (h, w), stride in zip(spatial_shapes[:num_encoder_levels],
                              strides[:num_encoder_levels]):
        p = single_level_grid_points(h, w, stride)
        factor = jnp.array([[w * stride, h * stride]], dtype=jnp.float32)
        pts.append(p / factor)
    return jnp.concatenate(pts, axis=0)


def encoder_reference_points(
        spatial_shapes: Sequence[Tuple[int, int]],
        valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Deformable-DETR encoder reference points.

    Args:
        spatial_shapes: static ((H, W), ...) per level, high->low res order
            as used by the det path.
        valid_ratios: (B, num_levels, 2) fraction (w_ratio, h_ratio) of each
            level that is valid (non-padded).
    Returns:
        (B, sum_hw, num_levels, 2) normalized (x, y) in the valid frame.
    """
    ref_list = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=jnp.float32) + 0.5)
        ref_x = (jnp.arange(w, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ref_y, ref_x, indexing="ij")
        # normalize by valid extent: (B, h*w)
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        ref_list.append(jnp.stack([gx, gy], axis=-1))  # (B, h*w, 2)
    ref = jnp.concatenate(ref_list, axis=1)            # (B, sum_hw, 2)
    # broadcast over sampling levels, scaled by each level's valid ratio
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def level_start_indices(
        spatial_shapes: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    starts = [0]
    for (h, w) in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)
