"""MultiScaleDeformableAttention module (flax.linen).

Capability-equivalent of mmcv's ``MultiScaleDeformableAttention`` (the CUDA
op + its projection layers), used by the shared encoder and the DINO decoder
cross-attention (reference configs/multi/MTL_slvlcls_...py:39-43,87-90).
The sampling core is rscotr_tpu.ops.ms_deform_attn (XLA gather / Pallas).

Init matches the reference's explicit ``attn.init_weights()`` calls
(multitask_learner.py:73-79): sampling_offsets weight zero with a rotational
grid bias; attention_weights zero; value/output proj xavier-uniform with zero
bias.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.ops.ms_deform_attn import ms_deform_attn


def _sampling_offsets_bias_init(num_heads: int, num_levels: int,
                                num_points: int):
    """Rotational grid init (mmcv MultiScaleDeformableAttention.init_weights)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        thetas = jnp.arange(num_heads, dtype=jnp.float32) * \
            (2.0 * math.pi / num_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # (H, 2)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :],
                        (1, num_levels, num_points, 1))
        scale = jnp.arange(1, num_points + 1,
                           dtype=jnp.float32)[None, None, :, None]
        grid = grid * scale
        return grid.reshape(-1).astype(dtype)

    return init


class MultiScaleDeformableAttention(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 value: jnp.ndarray,
                 identity: Optional[jnp.ndarray] = None,
                 query_pos: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 reference_points: Optional[jnp.ndarray] = None,
                 spatial_shapes: Tuple[Tuple[int, int], ...] = (),
                 deterministic: bool = True) -> jnp.ndarray:
        """
        Args:
            query: (B, Nq, C). value: (B, Nv, C).
            reference_points: (B, Nq, num_levels, 2) normalized centers, or
                (B, Nq, num_levels, 4) normalized cxcywh boxes.
            key_padding_mask: (B, Nv) bool, True = padded.
            spatial_shapes: static per-level (H, W).
        """
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        B, Nq, C = query.shape
        Nv = value.shape[1]
        H, L, P = self.num_heads, self.num_levels, self.num_points
        assert len(spatial_shapes) == L
        assert sum(h * w for h, w in spatial_shapes) == Nv

        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(B, Nv, H, C // H)

        offsets = nn.Dense(
            H * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(H, L, P),
            name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Nq, H, L, P, 2)

        attn = nn.Dense(H * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = attn.reshape(B, Nq, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Nq, H, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=jnp.float32)
            locs = reference_points[:, :, None, :, None, :] + \
                offsets / normalizer[None, None, None, :, None, :]
        elif reference_points.shape[-1] == 4:
            locs = reference_points[:, :, None, :, None, :2] + \
                offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(v, spatial_shapes, locs, attn)
        out = nn.Dense(C, dtype=self.dtype,
                       bias_init=nn.initializers.zeros,
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out
