"""Standalone single-task segmentor.

Capability-equivalent of the reference's ``RSCoTrSeg`` (/root/reference/
models/seg/rscotr_seg.py:9-25): backbone -> Mask2Former-style head whose
pixel decoder OWNS its deformable encoder (default 3 encoder levels) and
projects raw backbone channels with input convs
(models/seg/rscotr_seg_pixel_decoder.py:49-68). Whole-image inference comes
from the shared engine (resize + argmax), matching mmseg EncoderDecoder
semantics (mode='whole').
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import MODELS
from rscotr_tpu.models.layers.transformer import DeformableEncoder


class RSCoTrSeg(nn.Module):
    backbone: nn.Module
    seg_head: nn.Module          # Mask2FormerHead w/ pixel_decoder_input_convs
    encoder: DeformableEncoder   # owned (3-level by default)

    def __call__(self, img, deterministic: bool = True):
        bb = self.backbone(img, deterministic=deterministic)

        def encode_fn(tokens, pos, ref, shapes, key_padding_mask=None,
                      deterministic=deterministic):
            return self.encoder(tokens, pos, ref, shapes,
                                key_padding_mask=key_padding_mask,
                                deterministic=deterministic)

        # standalone: the head's pixel decoder consumes RAW backbone levels
        # (projected by its input convs) and FPN-fuses the remaining
        # high-res levels
        from rscotr_tpu.models.mtl import outputs_f32
        return outputs_f32(
            self.seg_head(bb, bb, encode_fn=encode_fn,
                          deterministic=deterministic))

    def forward_seg(self, img, deterministic: bool = True):
        return self(img, deterministic)


MODELS.register_module(name="RSCoTrSeg", module=RSCoTrSeg)
