"""MTL — the multi-task co-training model.

Capability-equivalent of the reference's ``MTL``
(/root/reference/models/multi/multitask_learner.py:34-371): shared backbone
-> shared ChannelMapper neck (over the last 3 backbone levels) -> shared
6-layer deformable encoder threaded into three task heads:

* cls: SlvlClsHead (GAP, ignores neck/encoder) or MlvlClsHead
* det: DINOHead (two-stage deformable DETR + CDN)
* seg: Mask2FormerHead (masked-attention decoder, scheme 1/2)

The shared encoder is a single submodule whose bound application is passed
into each head as ``encode_fn`` — the params appear once in the pytree, so
"sharing" is structural, not by weight copying.

Losses, task_weight scaling, and train/val steps live in
rscotr_tpu/engine/train_step.py (functional, jitted per task).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import MODELS

SUPPORTED_TASKS = ("cls", "det", "seg")


def outputs_f32(out):
    """Cast every floating leaf of a task-forward output to f32.

    With ``compute_dtype='bfloat16'`` the modules run bf16 internally; task
    outputs (logits/coords/masks) come back to f32 at the model boundary so
    losses, softmaxes, and eval metrics are dtype-stable regardless of the
    compute dtype (the cast is linear — gradients are unaffected)."""
    def cast(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype,
                                                         jnp.floating):
            return x.astype(jnp.float32)
        return x
    return jax.tree.map(cast, out)


class MTL(nn.Module):
    backbone: nn.Module
    neck: Optional[nn.Module]
    shared_encoder: nn.Module
    cls_head: Optional[nn.Module] = None
    bbox_head: Optional[nn.Module] = None
    seg_head: Optional[nn.Module] = None
    neck_in_levels: int = 3        # neck consumes the LAST n backbone levels

    def encode(self, tokens, pos, reference_points, spatial_shapes,
               key_padding_mask=None, deterministic: bool = True):
        return self.shared_encoder(tokens, pos, reference_points,
                                   spatial_shapes,
                                   key_padding_mask=key_padding_mask,
                                   deterministic=deterministic)

    def extract_feat(self, img, deterministic: bool = True):
        """img: (B, H, W, 3) -> (neck_feats, backbone_feats).

        Reference extract_feat (multitask_learner.py:81-85): neck over the
        last ``neck_in_levels`` backbone levels.
        """
        bb = self.backbone(img, deterministic=deterministic)
        if self.neck is None:
            return bb, bb
        nk = self.neck(bb[len(bb) - self.neck_in_levels:])
        return nk, bb

    # -- per-task forwards ---------------------------------------------------
    def forward_cls(self, img, deterministic: bool = True):
        nk, bb = self.extract_feat(img, deterministic)
        return outputs_f32(
            self.cls_head(nk, bb, encode_fn=self._encode_fn(deterministic),
                          deterministic=deterministic))

    def forward_det(self, img, img_hw, dn_label_query=None,
                    dn_bbox_query=None, attn_mask=None,
                    deterministic: bool = True):
        nk, bb = self.extract_feat(img, deterministic)
        return outputs_f32(
            self.bbox_head(nk, img_hw,
                           encode_fn=self._encode_fn(deterministic),
                           dn_label_query=dn_label_query,
                           dn_bbox_query=dn_bbox_query,
                           attn_mask=attn_mask,
                           deterministic=deterministic))

    def forward_seg(self, img, deterministic: bool = True):
        nk, bb = self.extract_feat(img, deterministic)
        return outputs_f32(
            self.seg_head(nk, bb, encode_fn=self._encode_fn(deterministic),
                          deterministic=deterministic))

    def _encode_fn(self, deterministic: bool) -> Callable:
        def fn(tokens, pos, ref, shapes, key_padding_mask=None,
               deterministic=deterministic):
            return self.encode(tokens, pos, ref, shapes,
                               key_padding_mask=key_padding_mask,
                               deterministic=deterministic)
        return fn

    def __call__(self, cls_img=None, det_img=None, det_img_hw=None,
                 seg_img=None, dn_label_query=None, dn_bbox_query=None,
                 attn_mask=None, deterministic: bool = True):
        """Init-path: run every configured task once so all params exist."""
        out: Dict[str, Any] = {}
        if cls_img is not None and self.cls_head is not None:
            out["cls"] = self.forward_cls(cls_img, deterministic)
        if det_img is not None and self.bbox_head is not None:
            out["det"] = self.forward_det(det_img, det_img_hw,
                                          dn_label_query, dn_bbox_query,
                                          attn_mask, deterministic)
        if seg_img is not None and self.seg_head is not None:
            out["seg"] = self.forward_seg(seg_img, deterministic)
        return out


MODELS.register_module(name="MTL", module=MTL)
