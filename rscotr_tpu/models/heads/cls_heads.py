"""Classification heads.

Capability-equivalents of the reference's ``SlvlClsHead``
(/root/reference/models/multi/cls_head/slvl_cls_head.py:9-28 — GAP of the
last backbone level -> linear, shared encoder IGNORED) and ``MlvlClsHead``
(mlvl_cls_head.py:13-146 — shared encoder over neck levels via
MlvlClsPixelDecoder, then one of 8 token-pooling schemes).

Both return logits; the loss (LabelSmoothLoss) is applied by the MTL model.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import HEADS
from rscotr_tpu.models.heads.pixel_decoders import MlvlClsPixelDecoder


class SlvlClsHead(nn.Module):
    """GAP(backbone[-1]) -> Linear(num_classes)."""
    num_classes: int = 45
    in_channels: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, neck_feats, backbone_feats, encode_fn=None,
                 deterministic: bool = True):
        x = backbone_feats[-1]                       # (B, h, w, C)
        cls_token = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(
            cls_token)


class MlvlClsHead(nn.Module):
    """Shared-encoder multi-level head with pooling scheme 1..8."""
    num_classes: int = 45
    in_channels: int = 256
    scheme: int = 5
    num_encoder_levels: int = 4
    strides: Sequence[int] = (8, 16, 32, 64)
    feat_channels: int = 256
    # static token counts per level for schemes 5-7 (set from input sizes)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, neck_feats, backbone_feats, encode_fn=None,
                 deterministic: bool = True):
        mlvl = MlvlClsPixelDecoder(
            num_encoder_levels=self.num_encoder_levels,
            strides=tuple(self.strides), feat_channels=self.feat_channels,
            dtype=self.dtype, name="pixel_decoder")(
                encode_fn, neck_feats, deterministic=deterministic)
        # mlvl: per-level NHWC maps, low->high resolution
        token = self._pre_logits(mlvl)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(token)

    def _pre_logits(self, mlvl):
        s = self.scheme
        gap = lambda f: jnp.mean(f, axis=(1, 2))  # noqa: E731
        flat = lambda f: f.reshape(f.shape[0], -1, f.shape[-1])  # noqa: E731
        if s == 1:
            return gap(mlvl[0])
        if s == 2:
            return gap(mlvl[1])
        if s == 3:
            seq = jnp.concatenate([flat(f) for f in mlvl], axis=1)
            return jnp.mean(seq, axis=1)
        if s == 4:
            toks = [gap(f) for f in mlvl]
            return sum(toks) / len(toks)
        if s in (5, 6):
            idx = 0 if s == 5 else 1
            seq = flat(mlvl[idx])                  # (B, n, C)
            n = seq.shape[1]
            w = self.param("out_proj_w", _const_init(1.0 / n), (n, 1))
            b = self.param("out_proj_b", nn.initializers.zeros, (1,))
            return (jnp.einsum("bnc,nk->bkc", seq, w)[:, 0] + b)
        if s == 7:
            seq = jnp.concatenate([flat(f) for f in mlvl], axis=1)
            n = seq.shape[1]
            w = self.param("out_proj_w", _const_init(1.0 / n), (n, 1))
            b = self.param("out_proj_b", nn.initializers.zeros, (1,))
            return (jnp.einsum("bnc,nk->bkc", seq, w)[:, 0] + b)
        if s == 8:
            toks = jnp.stack([gap(f) for f in mlvl], axis=-1)  # (B, C, L)
            L = toks.shape[-1]
            w = self.param("out_proj_w", _const_init(1.0 / L), (L, 1))
            b = self.param("out_proj_b", nn.initializers.zeros, (1,))
            return (toks @ w)[..., 0] + b
        raise ValueError(f"unknown scheme {s}")


def _const_init(val):
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, val, dtype)
    return init


HEADS.register_module(name="SlvlClsHead", module=SlvlClsHead)
HEADS.register_module(name="MlvlClsHead", module=MlvlClsHead)
