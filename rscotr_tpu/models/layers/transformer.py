"""Transformer layer sequences (flax.linen).

Capability-equivalents of the mmcv layer sequences the reference configures:
* ``DetrTransformerEncoder`` of BaseTransformerLayer(MSDeformAttn -> norm ->
  FFN -> norm) — the SHARED ENCODER (configs/multi/MTL_slvlcls_...py:34-50).
* DINO decoder layer: self_attn -> norm -> cross_attn(MSDA) -> norm -> ffn ->
  norm (ibid:77-97); the refine loop lives in models/heads/dino_transformer.
* Mask2Former decoder layer: cross_attn -> norm -> self_attn -> norm -> ffn
  -> norm (ibid:138-152); loop lives in models/heads/mask2former_head.

Explicit modules instead of a string-driven operation_order engine — the
orders used by the reference are hard-wired, which keeps the jitted graphs
static and legible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.models.layers.attention import MultiheadAttention
from rscotr_tpu.models.layers.common import FFN
from rscotr_tpu.models.layers.msda import MultiScaleDeformableAttention


class DeformableEncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, reference_points, spatial_shapes,
                 key_padding_mask=None, deterministic: bool = True):
        x = MultiScaleDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dropout=self.dropout, dtype=self.dtype, name="self_attn")(
                query=x, value=x, query_pos=query_pos,
                key_padding_mask=key_padding_mask,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                ffn_drop=self.ffn_drop, dtype=self.dtype, name="ffn")(
                    x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x


class DeformableEncoder(nn.Module):
    """The shared 6-layer multi-scale deformable encoder.

    One parameter set shared (in the pytree sense: a single module instance)
    by all three task heads — callers thread the module application through
    ``encode_fn``.
    """
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0
    dropout: float = 0.0
    # activation rematerialization: store only layer INPUTS for the
    # backward and recompute each layer's intermediates (jax.checkpoint) —
    # trades recompute FLOPs for HBM residuals (the gathered MSDA tensors
    # are the big ones). mmcv's analogous knob is ``with_cp`` torch
    # checkpointing on transformer layers.
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, reference_points, spatial_shapes,
                 key_padding_mask=None, deterministic: bool = True):
        layer_cls = DeformableEncoderLayer
        if self.with_cp:
            # spatial_shapes is a static tuple of python ints (argnum 4);
            # deterministic is a python bool (argnum 6); self is argnum 0.
            layer_cls = nn.remat(DeformableEncoderLayer,
                                 static_argnums=(4, 6))
        for i in range(self.num_layers):
            x = layer_cls(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                num_levels=self.num_levels, num_points=self.num_points,
                feedforward_channels=self.feedforward_channels,
                ffn_drop=self.ffn_drop, dropout=self.dropout,
                dtype=self.dtype, name=f"layers_{i}")(
                    x, query_pos, reference_points, spatial_shapes,
                    key_padding_mask, deterministic)
        return x


class DinoDecoderLayer(nn.Module):
    """self_attn -> norm -> cross_attn(MSDA) -> norm -> ffn -> norm."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos, memory, reference_points,
                 spatial_shapes, self_attn_mask=None,
                 key_padding_mask=None, deterministic: bool = True):
        x = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype, name="self_attn")(
                query=x, query_pos=query_pos, attn_mask=self_attn_mask,
                deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = MultiScaleDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dropout=self.dropout, dtype=self.dtype, name="cross_attn")(
                query=x, value=memory, query_pos=query_pos,
                key_padding_mask=key_padding_mask,
                reference_points=reference_points,
                spatial_shapes=spatial_shapes, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                ffn_drop=self.ffn_drop, dtype=self.dtype, name="ffn")(
                    x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        return x


class MaskedAttentionDecoderLayer(nn.Module):
    """cross_attn -> norm -> self_attn -> norm -> ffn -> norm (Mask2Former)."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, query_pos, key_pos, cross_attn_mask=None,
                 deterministic: bool = True):
        x = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype, name="cross_attn")(
                query=x, key=memory, value=memory, query_pos=query_pos,
                key_pos=key_pos, attn_mask=cross_attn_mask,
                deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype, name="self_attn")(
                query=x, query_pos=query_pos, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        x = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                ffn_drop=self.ffn_drop, dtype=self.dtype, name="ffn")(
                    x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        return x
