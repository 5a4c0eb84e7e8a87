"""Swin Transformer backbone (flax.linen, NHWC, static shapes).

Capability-equivalent of the mmdet ``SwinTransformer`` the reference uses as
its shared backbone (configs/multi/MTL_slvlcls_...py:9-25: Swin-T, embed 96,
depths [2,2,6,2], heads [3,6,12,24], window 7, mlp_ratio 4, drop_path 0.2,
patch_norm, out_indices (0,1,2,3)).

Design notes (TPU-first):
* All shapes static: window pad sizes and shifted-window attention masks are
  computed with numpy at trace time.
* Window attention runs as one big batched MXU matmul over
  (B * num_windows, 49, C); a fused Pallas window-attention kernel can slot
  in behind the same module boundary.
* PatchMerging uses the original Swin gather order ([x00; x10; x01; x11]
  channel concat); the torch->jax weight converter permutes mmdet's
  unfold-ordered weights to match.
* LayerNorm eps 1e-5 and exact (erf) GELU for parity with torch.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import BACKBONES
from rscotr_tpu.models.layers.common import DropPath, drop_path_rates

LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)


def _rel_pos_index(window_size: int) -> np.ndarray:
    """Static relative-position index table, (w*w, w*w) int32."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))          # (2, w, w)
    coords = coords.reshape(2, -1)                          # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]           # (2, n, n)
    rel = rel.transpose(1, 2, 0)                            # (n, n, 2)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1).astype(np.int32)


def _shift_attn_mask(Hp: int, Wp: int, window: int,
                     shift: int) -> np.ndarray:
    """Static additive attention mask for shifted windows, (nW, n, n)."""
    img_mask = np.zeros((Hp, Wp), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    m = img_mask.reshape(Hp // window, window, Wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    attn_mask = (m[:, None, :] != m[:, :, None]).astype(np.float32) * -100.0
    return attn_mask


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window*window, C); H, W divisible by window."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_unpartition(x: jnp.ndarray, window: int, H: int, W: int,
                       B: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: bool = False   # Pallas fused QK^T+bias+mask+softmax+PV kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        """x: (B_, n, C) windows; attn_mask: (nW, n, n) additive or None."""
        B_, n, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = self.qk_scale or hd ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B_, n, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (B_, H, n, hd)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, H))
        idx = jnp.asarray(_rel_pos_index(self.window_size))
        rel_bias = bias_table[idx.reshape(-1)].reshape(n, n, H)
        rel_bias = rel_bias.transpose(2, 0, 1)    # (H, n, n)

        use_fused = (self.fused and self.attn_drop == 0.0
                     and jax.default_backend() == "tpu")
        if use_fused:
            from rscotr_tpu.ops.pallas.window_attention import \
                window_attention_fused
            nW = attn_mask.shape[0] if attn_mask is not None else 1
            Bimg = B_ // nW
            def split(t):
                return t.reshape(Bimg, nW, H, n, hd)
            o = window_attention_fused(
                split(q), split(k), split(v), rel_bias,
                shift_mask=attn_mask, scale=scale)
            out = o.reshape(B_, H, n, hd)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
            attn = attn + rel_bias[None]
            if attn_mask is not None:
                nW = attn_mask.shape[0]
                attn = attn.reshape(B_ // nW, nW, H, n, n) + \
                    attn_mask[None, :, None]
                attn = attn.reshape(B_, H, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, n, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    fused_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C)."""
        # Window size is FIXED (the rel-pos table is shared across input
        # resolutions — one backbone serves 224/512/800 inputs); maps
        # smaller than the window are padded up, and shift is disabled when
        # a single window covers the map (original-Swin behavior).
        B, H, W, C = x.shape
        win = self.window_size
        shift = self.shift if min(H, W) > win else 0

        shortcut = x
        x = LayerNorm(name="norm1")(x)

        pad_b = (win - H % win) % win
        pad_r = (win - W % win) % win
        Hp, Wp = H + pad_b, W + pad_r
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, win, shift))
        else:
            mask = None

        xw = window_partition(x, win)
        xw = WindowAttention(
            dim=C, num_heads=self.num_heads, window_size=win,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            fused=self.fused_attn, dtype=self.dtype, name="attn")(
                xw, mask, deterministic=deterministic)
        x = window_unpartition(xw, win, Hp, Wp, B)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :H, :W]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic=deterministic)

        y = LayerNorm(name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic=deterministic)
        return x


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 2C)."""
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


@BACKBONES.register_module(name="SwinTransformer")
class SwinTransformer(nn.Module):
    """Swin backbone returning per-stage NHWC feature maps."""
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    with_cp: bool = False          # per-block activation remat (see below)
    convert_weights: bool = True   # config parity (handled by converter)
    fused_window_attn: bool = False  # Pallas fused attention (TPU)
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) -> tuple of (B, H/s, W/s, C_i) for out_indices."""
        ps = self.patch_size
        H, W = x.shape[1], x.shape[2]
        pad_b = (ps - H % ps) % ps
        pad_r = (ps - W % ps) % ps
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = LayerNorm(name="patch_norm")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        dprs = drop_path_rates(self.drop_path_rate, self.depths)
        outs = []
        dim = self.embed_dims
        # with_cp = activation rematerialization per block (mmcv Swin's
        # torch.utils.checkpoint knob): backward stores only block inputs
        # and recomputes intermediates (jax.checkpoint); deterministic is
        # static argnum 2 (self is 0).
        block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                     if self.with_cp else SwinBlock)
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                block = block_cls(
                    dim=dim, num_heads=self.num_heads[si],
                    window_size=self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=dprs[si][bi],
                    fused_attn=self.fused_window_attn, dtype=self.dtype,
                    name=f"stage{si}_block{bi}")
                x = block(x, deterministic)
            if si in self.out_indices:
                outs.append(LayerNorm(name=f"out_norm{si}")(x))
            if si < len(self.depths) - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype,
                                 name=f"downsample{si}")(x)
                dim *= 2
        return tuple(outs)
