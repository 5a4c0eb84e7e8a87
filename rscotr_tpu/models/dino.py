"""Standalone single-task DINO detector.

Capability-equivalent of the reference's ``DINO`` (/root/reference/models/
det/dino.py:8-28) whose transformer OWNS its encoder (models/det/
transformer.py:198) — this is the task-pretrain source whose encoder weights
are remapped into the MTL's shared_encoder (reference
multitask_learner.py:308-353). Here the owned encoder is a regular
DeformableEncoder submodule named 'encoder' so the remap is a pytree move.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import MODELS
from rscotr_tpu.models.layers.transformer import DeformableEncoder


class DINO(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    encoder: DeformableEncoder
    neck_in_levels: int = 3

    def extract_feat(self, img, deterministic: bool = True):
        bb = self.backbone(img, deterministic=deterministic)
        return self.neck(bb[len(bb) - self.neck_in_levels:])

    def __call__(self, img, img_hw, dn_label_query=None,
                 dn_bbox_query=None, attn_mask=None,
                 deterministic: bool = True):
        feats = self.extract_feat(img, deterministic)

        def encode_fn(tokens, pos, ref, shapes, key_padding_mask=None,
                      deterministic=deterministic):
            return self.encoder(tokens, pos, ref, shapes,
                                key_padding_mask=key_padding_mask,
                                deterministic=deterministic)

        from rscotr_tpu.models.mtl import outputs_f32
        return outputs_f32(
            self.bbox_head(feats, img_hw, encode_fn=encode_fn,
                           dn_label_query=dn_label_query,
                           dn_bbox_query=dn_bbox_query,
                           attn_mask=attn_mask,
                           deterministic=deterministic))

    # method aliases so engine train/infer steps work unchanged
    def forward_det(self, img, img_hw, dn_label_query=None,
                    dn_bbox_query=None, attn_mask=None,
                    deterministic: bool = True):
        return self(img, img_hw, dn_label_query, dn_bbox_query, attn_mask,
                    deterministic)


MODELS.register_module(name="DINO", module=DINO)
