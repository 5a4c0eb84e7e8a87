"""Mask2Former-style semantic segmentation head.

Capability-equivalent of the reference's modified ``Mask2FormerHead``
(/root/reference/models/multi/seg_head/mask2former_head.py:17-208):
* learned query_feat / query_embed (100 queries) + level_embed (4 levels)
* 9 masked-attention decoder layers (cross->self->ffn) cycling 4 feature
  levels; attention mask = previous mask prediction sigmoid < 0.5, with
  all-True rows reset to all-False (ibid:180-182)
* scheme 1: seg logits = einsum(cls_embed(q), mask_pred) (semantic-DETR);
  scheme 2: mask_pred used directly as class logits (num_queries' first
  num_classes channels consumed by CE — the reference's flagship quirk,
  SURVEY.md §2.3 note)
* returns final-layer seg logits (B, H/4-ish, W/4-ish, Q or C+1-combined)

The pixel decoder (MlvlSegPixelDecoder) runs the SHARED encoder.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import HEADS
from rscotr_tpu.models.heads.pixel_decoders import (MlvlSegPixelDecoder,
                                                    _resize_bilinear)
from rscotr_tpu.models.layers.common import Mlp
from rscotr_tpu.models.layers.transformer import MaskedAttentionDecoderLayer
from rscotr_tpu.ops.pos_encoding import sine_positional_encoding


class Mask2FormerHead(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    feat_channels: int = 256
    out_channels: int = 256
    num_classes: int = 5
    num_queries: int = 100
    num_transformer_feat_level: int = 4
    scheme: int = 2
    num_heads: int = 8
    num_decoder_layers: int = 9
    feedforward_channels: int = 2048
    pos_temperature: float = 10000.0
    pixel_decoder_strides: Sequence[int] = (4, 8, 16, 32)
    pixel_decoder_input_convs: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, neck_feats, backbone_feats, encode_fn: Callable,
                 deterministic: bool = True):
        """Returns seg logits (B, Hm, Wm, num_queries|num_classes+1)."""
        B = backbone_feats[0].shape[0]
        C = self.feat_channels
        Q = self.num_queries
        L = self.num_transformer_feat_level

        mask_feature, ms_feats = MlvlSegPixelDecoder(
            num_encoder_levels=L, in_channels=tuple(self.in_channels),
            strides=tuple(self.pixel_decoder_strides),
            feat_channels=C, out_channels=self.out_channels,
            num_outs=L, pos_temperature=self.pos_temperature,
            use_input_convs=self.pixel_decoder_input_convs,
            dtype=self.dtype, name="pixel_decoder")(
                encode_fn, neck_feats, backbone_feats,
                deterministic=deterministic)
        # ms_feats: low->high res; mask_feature: (B, Hm, Wm, C)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (L, C))
        dec_inputs, dec_pos = [], []
        for i in range(L):
            f = ms_feats[i]
            h, w = f.shape[1], f.shape[2]
            x = f.reshape(B, h * w, C) + level_embed[i][None, None, :]
            mask = jnp.zeros((B, h, w), dtype=bool)
            pos = sine_positional_encoding(
                mask, num_feats=C // 2, temperature=self.pos_temperature,
                normalize=True).reshape(B, h * w, C)
            dec_inputs.append(x)
            dec_pos.append(pos)

        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (Q, C))
        q = jnp.broadcast_to(query_feat[None], (B, Q, C))
        qp = jnp.broadcast_to(query_embed[None], (B, Q, C))

        post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        mask_embed = Mlp(hidden_dim=C, output_dim=self.out_channels,
                         num_layers=3, dtype=self.dtype, name="mask_embed")
        if self.scheme == 1:
            cls_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                 name="cls_embed")
        else:
            cls_embed = None

        def forward_head(q_cur, attn_target_hw):
            d = post_norm(q_cur)
            me = mask_embed(d)                                   # (B, Q, C)
            mask_pred = jnp.einsum("bqc,bhwc->bqhw", me, mask_feature)
            if self.scheme == 1:
                cls_pred = cls_embed(d)                          # (B,Q,K+1)
                seg = jnp.einsum("bqk,bqhw->bkhw", cls_pred, mask_pred)
            elif self.scheme == 2:
                seg = mask_pred
            else:
                raise NotImplementedError(f"scheme {self.scheme}")
            # attention mask for next layer at target level resolution
            am = _resize_bilinear(
                mask_pred.transpose(0, 2, 3, 1),
                attn_target_hw).transpose(0, 3, 1, 2)            # (B,Q,h,w)
            am = am.reshape(B, Q, -1)
            am = jax.nn.sigmoid(am) < 0.5                        # True=block
            am = jax.lax.stop_gradient(am)
            # reference resets all-True rows to all-False
            all_true = jnp.all(am, axis=-1, keepdims=True)
            am = jnp.where(all_true, False, am)
            # (B, Q, hw) -> (B*heads, Q, hw)
            am = jnp.repeat(am[:, None], self.num_heads, axis=1)
            return seg, am.reshape(B * self.num_heads, Q, -1)

        seg, attn_mask = forward_head(q, ms_feats[0].shape[1:3])
        for i in range(self.num_decoder_layers):
            lvl = i % L
            q = MaskedAttentionDecoderLayer(
                embed_dims=C, num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                dtype=self.dtype, name=f"decoder_layers_{i}")(
                    q, dec_inputs[lvl], qp, dec_pos[lvl],
                    cross_attn_mask=attn_mask, deterministic=deterministic)
            seg, attn_mask = forward_head(
                q, ms_feats[(i + 1) % L].shape[1:3])

        # (B, Qc, Hm, Wm) -> NHWC logits
        return seg.transpose(0, 2, 3, 1)


HEADS.register_module(name="Mask2FormerHead", module=Mask2FormerHead)
