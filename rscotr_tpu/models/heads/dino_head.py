"""DINO detection head (two-stage deformable DETR + CDN), TPU-first.

Capability-equivalent of the reference's ``DINOHead`` + ``DinoTransformer``
+ ``DinoTransformerDecoder`` (/root/reference/models/multi/bbox_head/
dino_head.py:16-382, transformer.py:32-273), with the encoder passed in as
``encode_fn`` (the SHARED encoder — transformer.py:211-221).

Static-shape design:
* images padded to a bucket size; per-image valid (h, w) drives padding
  masks and valid ratios (reference dino_head.py:91-106).
* GTs padded to max_gt; CDN pad_size static (see cdn.py).
* two-stage proposal gen masks invalid tokens with a large finite constant
  (reference uses inf; finite keeps sigmoid gradients clean under jit).

Forward returns per-layer class logits and boxes for ALL (dn + matching)
queries; the loss splits them by the static pad_size
(reference extract_dn_outputs, dino_head.py:367-382).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import HEADS
from rscotr_tpu.models.layers.common import Mlp
from rscotr_tpu.models.layers.transformer import DinoDecoderLayer
from rscotr_tpu.ops.box_ops import inverse_sigmoid
from rscotr_tpu.ops.point_generator import encoder_reference_points
from rscotr_tpu.ops.pos_encoding import (coordinate_sine_embedding,
                                         sine_positional_encoding)

BIG = 1e4  # finite stand-in for the reference's masked_fill(inf)


def _bias_init_prob(prior: float):
    b = -float(np.log((1 - prior) / prior))

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, b, dtype)

    return init


class RegBranch(nn.Module):
    """Linear-ReLU-Linear-ReLU-Linear(4), final layer zero-init."""
    embed_dims: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(4, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="fc2")(x)


def mlvl_masks_and_ratios(spatial_shapes, strides, img_hw, B):
    """Per-level padding masks (True=pad) + valid ratios from actual (h, w).

    img_hw: (B, 2) int (h, w) of the un-padded content.
    """
    masks, ratios = [], []
    img_h = img_hw[:, 0].astype(jnp.float32)
    img_w = img_hw[:, 1].astype(jnp.float32)
    for (h, w), s in zip(spatial_shapes, strides):
        ys = jnp.arange(h, dtype=jnp.float32) * s
        xs = jnp.arange(w, dtype=jnp.float32) * s
        valid_y = ys[None, :] < img_h[:, None]          # (B, h)
        valid_x = xs[None, :] < img_w[:, None]          # (B, w)
        mask = ~(valid_y[:, :, None] & valid_x[:, None, :])
        masks.append(mask)
        vh = jnp.sum(valid_y.astype(jnp.float32), axis=1) / h
        vw = jnp.sum(valid_x.astype(jnp.float32), axis=1) / w
        ratios.append(jnp.stack([vw, vh], axis=-1))     # (B, 2)
    return masks, jnp.stack(ratios, axis=1)             # (B, L, 2)


class DINOHead(nn.Module):
    num_classes: int = 20
    num_query: int = 600
    embed_dims: int = 256
    num_decoder_layers: int = 6
    num_feature_levels: int = 4
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 2048
    pos_temperature: float = 20.0
    strides: Sequence[int] = (8, 16, 32, 64)
    sync_cls_avg_factor: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        L = self.num_decoder_layers
        self.level_embeds = self.param("level_embeds",
                                       nn.initializers.normal(1.0),
                                       (self.num_feature_levels,
                                        self.embed_dims))
        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_query, self.embed_dims))
        self.label_embedding = self.param("label_embedding",
                                          nn.initializers.normal(1.0),
                                          (self.num_classes,
                                           self.embed_dims))
        self.enc_output = nn.Dense(self.embed_dims, dtype=self.dtype)
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5)
        # L decoder branches + 1 encoder-proposal branch
        self.cls_branches = [
            nn.Dense(self.num_classes, bias_init=_bias_init_prob(0.01),
                     dtype=self.dtype, name=f"cls_branches_{i}")
            for i in range(L + 1)]
        self.reg_branches = [
            RegBranch(embed_dims=self.embed_dims, dtype=self.dtype,
                      name=f"reg_branches_{i}") for i in range(L + 1)]
        self.ref_point_head = Mlp(hidden_dim=self.embed_dims,
                                  output_dim=self.embed_dims, num_layers=2,
                                  dtype=self.dtype, name="ref_point_head")
        self.decoder_layers = [
            DinoDecoderLayer(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                num_levels=self.num_feature_levels,
                num_points=self.num_points,
                feedforward_channels=self.feedforward_channels,
                dtype=self.dtype, name=f"decoder_layers_{i}")
            for i in range(L)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, neck_feats, img_hw, encode_fn: Callable,
                 dn_label_query=None, dn_bbox_query=None, attn_mask=None,
                 deterministic: bool = True):
        """
        Args:
            neck_feats: 4 NHWC maps, high->low res (strides 8..64).
            img_hw: (B, 2) actual content size of each padded image.
            dn_label_query: (B, P, C) or None; dn_bbox_query: (B, P, 4)
                unsigmoided; attn_mask: static (tgt, tgt) bool np/jnp array.
        Returns:
            all_cls (L, B, N, num_classes), all_coords (L, B, N, 4) with
            N = P + num_query, topk_score (B, num_query, num_classes),
            topk_anchor (B, num_query, 4).
        """
        B = neck_feats[0].shape[0]
        C = self.embed_dims
        shapes = tuple((f.shape[1], f.shape[2]) for f in neck_feats)
        masks, valid_ratios = mlvl_masks_and_ratios(
            shapes, self.strides, img_hw, B)

        toks, poss, mflat = [], [], []
        for lvl, f in enumerate(neck_feats):
            h, w = shapes[lvl]
            pos = sine_positional_encoding(
                masks[lvl], num_feats=C // 2,
                temperature=self.pos_temperature, normalize=True)
            toks.append(f.reshape(B, h * w, C))
            poss.append(pos.reshape(B, h * w, C) +
                        self.level_embeds[lvl][None, None])
            mflat.append(masks[lvl].reshape(B, h * w))
        tokens = jnp.concatenate(toks, axis=1)
        pos_flat = jnp.concatenate(poss, axis=1)
        mask_flat = jnp.concatenate(mflat, axis=1)

        enc_ref = encoder_reference_points(shapes, valid_ratios)
        memory = encode_fn(tokens, pos_flat, enc_ref, shapes,
                           key_padding_mask=mask_flat,
                           deterministic=deterministic)

        # ---- two-stage proposal generation -------------------------------
        out_memory, out_proposals = self._gen_proposals(
            memory, mask_flat, shapes, valid_ratios)
        enc_cls = self.cls_branches[-1](out_memory)     # (B, S, K)
        enc_coord_unact = self.reg_branches[-1](out_memory) + out_proposals

        topk_scores_max = jnp.max(enc_cls, axis=-1)
        _, topk_idx = jax.lax.top_k(topk_scores_max, self.num_query)
        topk_score = jnp.take_along_axis(enc_cls, topk_idx[..., None],
                                         axis=1)
        topk_coords_unact = jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1)
        topk_anchor = jax.nn.sigmoid(topk_coords_unact)
        topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)

        # ---- assemble decoder queries -------------------------------------
        query = jnp.broadcast_to(self.query_embed[None],
                                 (B, self.num_query, C))
        if dn_label_query is not None:
            query = jnp.concatenate([dn_label_query, query], axis=1)
            ref_unact = jnp.concatenate([dn_bbox_query, topk_coords_unact],
                                        axis=1)
        else:
            ref_unact = topk_coords_unact
        reference_points = jax.nn.sigmoid(ref_unact)

        # ---- decoder with box refinement (look forward twice) -------------
        inter_states, inter_refs = [], [reference_points]
        x = query
        ref = reference_points
        for lid, layer in enumerate(self.decoder_layers):
            ref_input = ref[:, :, None, :] * jnp.concatenate(
                [valid_ratios, valid_ratios], -1)[:, None]  # (B,N,L,4)
            sine = coordinate_sine_embedding(ref_input[:, :, 0, :],
                                             num_feats=C // 2)
            query_pos = self.ref_point_head(sine)
            x = layer(x, query_pos, memory, ref_input, shapes,
                      self_attn_mask=attn_mask, key_padding_mask=mask_flat,
                      deterministic=deterministic)
            tmp = self.reg_branches[lid](x)
            new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(ref, eps=1e-3))
            ref = jax.lax.stop_gradient(new_ref)
            inter_states.append(self.decoder_norm(x))
            inter_refs.append(new_ref)   # non-detached: look forward twice

        # ---- per-layer outputs --------------------------------------------
        all_cls, all_coords = [], []
        for lvl in range(self.num_decoder_layers):
            reference = inverse_sigmoid(inter_refs[lvl], eps=1e-3)
            cls_out = self.cls_branches[lvl](inter_states[lvl])
            tmp = self.reg_branches[lvl](inter_states[lvl]) + reference
            all_cls.append(cls_out)
            all_coords.append(jax.nn.sigmoid(tmp))
        return (jnp.stack(all_cls), jnp.stack(all_coords),
                topk_score, topk_anchor)

    def _gen_proposals(self, memory, mask_flat, shapes, valid_ratios):
        """mmdet gen_encoder_output_proposals semantics with finite masking."""
        B = memory.shape[0]
        proposals = []
        for lvl, (h, w) in enumerate(shapes):
            gy = jnp.arange(h, dtype=jnp.float32)
            gx = jnp.arange(w, dtype=jnp.float32)
            yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
            grid = jnp.stack([xx, yy], -1).reshape(-1, 2)    # (hw, 2)
            scale = jnp.stack([valid_ratios[:, lvl, 0] * w,
                               valid_ratios[:, lvl, 1] * h],
                              -1)[:, None, :]                 # (B, 1, 2)
            grid = (grid[None] + 0.5) / scale
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            proposals.append(jnp.concatenate([grid, wh], -1))
        props = jnp.concatenate(proposals, axis=1)            # (B, S, 4)
        in_range = jnp.all((props > 0.01) & (props < 0.99), -1,
                           keepdims=True)
        props_unact = jnp.log(jnp.clip(props, 1e-9, None) /
                              jnp.clip(1.0 - props, 1e-9, None))
        invalid = mask_flat[..., None] | (~in_range)
        props_unact = jnp.where(invalid, BIG, props_unact)
        mem = jnp.where(invalid, 0.0, memory)
        mem = self.enc_output_norm(self.enc_output(mem))
        return mem, props_unact


HEADS.register_module(name="DINOHead", module=DINOHead)
