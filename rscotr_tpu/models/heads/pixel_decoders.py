"""Pixel decoders that route neck features through the SHARED encoder.

Capability-equivalents of the reference's
``MlvlClsPixelDecoder`` (/root/reference/models/multi/cls_head/
pixel_decoder.py:14-120) and ``MlvlSegPixelDecoder`` (/root/reference/models/
multi/seg_head/pixel_decoder.py:14-171).

Flatten scheme (both): iterate encoder levels from the LAST (lowest-res) neck
level; tokens ordered low->high resolution; per-level sine pos enc (temp
10000) + learned level embedding + normalized center reference points; run
the shared encoder; split tokens back into per-level NHWC maps. The seg
variant then FPN-fuses the remaining high-res BACKBONE levels and emits
(mask_feature, multi_scale_features).

The shared encoder arrives as ``encode_fn`` — a bound module owned by the
MTL parent so its params live once in the pytree.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.models.layers.common import GroupNorm2d
from rscotr_tpu.ops.point_generator import single_level_grid_points
from rscotr_tpu.ops.pos_encoding import sine_positional_encoding


def _flatten_levels_for_encoder(neck_feats, level_embed, num_encoder_levels,
                                strides, pos_temperature):
    """Shared flatten logic. neck_feats: high->low res tuple of NHWC.

    Returns (tokens, pos, ref_points, spatial_shapes_low2high).
    """
    num_input_levels = len(neck_feats)
    B = neck_feats[0].shape[0]
    toks, poss, refs, shapes = [], [], [], []
    for i in range(num_encoder_levels):
        level_idx = num_input_levels - i - 1
        f = neck_feats[level_idx]                    # (B, h, w, C)
        h, w = f.shape[1], f.shape[2]
        mask = jnp.zeros((B, h, w), dtype=bool)      # no padding
        pos = sine_positional_encoding(mask, num_feats=f.shape[-1] // 2,
                                       temperature=pos_temperature,
                                       normalize=True)
        pos = pos + level_embed[i][None, None, None, :]
        pts = single_level_grid_points(h, w, strides[level_idx])
        factor = jnp.array([[w * strides[level_idx],
                             h * strides[level_idx]]], jnp.float32)
        refs.append(pts / factor)
        toks.append(f.reshape(B, h * w, -1))
        poss.append(pos.reshape(B, h * w, -1))
        shapes.append((h, w))
    tokens = jnp.concatenate(toks, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    ref = jnp.concatenate(refs, axis=0)              # (sum_hw, 2)
    ref = jnp.broadcast_to(ref[None, :, None, :],
                           (B, ref.shape[0], num_encoder_levels, 2))
    return tokens, pos, ref, tuple(shapes)


def _split_levels(memory, spatial_shapes):
    """(B, sum_hw, C) -> list of (B, h, w, C) in spatial_shapes order."""
    outs, start = [], 0
    for (h, w) in spatial_shapes:
        outs.append(memory[:, start:start + h * w].reshape(
            memory.shape[0], h, w, -1))
        start += h * w
    return outs


class MlvlClsPixelDecoder(nn.Module):
    """Runs neck features through the shared encoder; returns per-level maps
    (low->high resolution), for the multi-level classification head."""
    num_encoder_levels: int = 4
    strides: Sequence[int] = (8, 16, 32, 64)
    feat_channels: int = 256
    num_outs: int = 4
    pos_temperature: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encode_fn: Callable, neck_feats,
                 deterministic: bool = True):
        level_embed = self.param("level_encoding",
                                 nn.initializers.normal(1.0),
                                 (self.num_encoder_levels,
                                  self.feat_channels))
        tokens, pos, ref, shapes = _flatten_levels_for_encoder(
            neck_feats, level_embed, self.num_encoder_levels, self.strides,
            self.pos_temperature)
        memory = encode_fn(tokens, pos, ref, shapes,
                           deterministic=deterministic)
        return _split_levels(memory, shapes)


class MlvlSegPixelDecoder(nn.Module):
    """Shared-encoder pixel decoder + FPN fuse of high-res backbone levels.

    Reference quirk preserved: the encoder consumes NECK features (already
    256-d) while the FPN laterals consume the raw BACKBONE levels that were
    not given to the encoder (seg_head/pixel_decoder.py:158-167).
    """
    num_encoder_levels: int = 4
    in_channels: Sequence[int] = (96, 192, 384, 768)   # backbone channels
    strides: Sequence[int] = (4, 8, 16, 32)
    feat_channels: int = 256
    out_channels: int = 256
    num_outs: int = 4
    pos_temperature: float = 10000.0
    use_input_convs: bool = False   # standalone variant: project raw
    # backbone levels to feat_channels before the encoder (the MTL variant
    # drops input convs because the neck already projects — reference
    # models/seg/rscotr_seg_pixel_decoder.py vs models/multi/seg_head/)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encode_fn: Callable, neck_feats, backbone_feats,
                 deterministic: bool = True):
        """neck_feats: 4 levels (strides 8..64 in MTL). backbone_feats: 4
        levels (strides 4..32); the levels below num_encoder_levels are
        FPN-fused. Returns (mask_feature, multi_scale_features low->high)."""
        num_input_levels = len(backbone_feats)
        if self.use_input_convs:
            projected = []
            n = len(neck_feats)
            for i in range(self.num_encoder_levels):
                level_idx = n - i - 1
                x = nn.Conv(self.feat_channels, (1, 1), use_bias=True,
                            dtype=self.dtype,
                            name=f"input_conv_{i}")(neck_feats[level_idx])
                x = GroupNorm2d(name=f"input_gn_{i}")(x)
                projected.append(x)
            # rebuild high->low order expected by the flatten helper
            neck_feats = tuple(
                list(neck_feats[:n - self.num_encoder_levels]) +
                list(reversed(projected)))
        level_embed = self.param("level_encoding",
                                 nn.initializers.normal(1.0),
                                 (self.num_encoder_levels,
                                  self.feat_channels))
        # encoder runs on neck levels; strides of neck levels: the MTL neck
        # emits strides 8,16,32,64 while self.strides describes the backbone
        # levels 4,8,16,32. The reference indexes its stride table with the
        # *input level index*, so we mirror that exactly.
        enc_strides = [self.strides[min(i, len(self.strides) - 1)]
                       for i in range(len(neck_feats))]
        tokens, pos, ref, shapes = _flatten_levels_for_encoder(
            neck_feats, level_embed, self.num_encoder_levels, enc_strides,
            self.pos_temperature)
        memory = encode_fn(tokens, pos, ref, shapes,
                           deterministic=deterministic)
        outs = _split_levels(memory, shapes)   # low->high res

        # FPN fuse remaining backbone levels (highest-res ones)
        num_fpn = num_input_levels - self.num_encoder_levels
        for k, i in enumerate(range(num_fpn - 1, -1, -1)):
            x = backbone_feats[i]
            lat = nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"lateral_conv_{i}")(x)
            lat = GroupNorm2d(name=f"lateral_gn_{i}")(lat)
            y = lat + _resize_bilinear(outs[-1], lat.shape[1:3])
            y = nn.Conv(self.feat_channels, (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"output_conv_{i}")(y)
            y = GroupNorm2d(name=f"output_gn_{i}")(y)
            y = nn.relu(y)
            outs.append(y)

        multi_scale_features = outs[:self.num_outs]
        mask_feature = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="mask_feature")(outs[-1])
        return mask_feature, multi_scale_features


def _interp_matrix(out_size: int, in_size: int) -> "np.ndarray":
    """(out, in) row-stochastic bilinear sampling matrix with half-pixel
    centers and edge clamping — the exact grid of torch
    ``F.interpolate(mode='bilinear', align_corners=False)``."""
    import numpy as np
    ys = np.clip((np.arange(out_size) + 0.5) * in_size / out_size - 0.5,
                 0, in_size - 1)
    y0 = np.floor(ys).astype(int)
    y1 = np.minimum(y0 + 1, in_size - 1)
    wy = ys - y0
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), y0] += 1.0 - wy
    m[np.arange(out_size), y1] += wy
    return m


def _resize_bilinear(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Bilinear NHWC resize, align_corners=False semantics (half-pixel
    centers, point sampling) — matches torch ``F.interpolate`` for BOTH
    up- and down-sampling. ``jax.image.resize`` is NOT usable here: it
    antialiases minification (the reference's mask2former attention-mask
    downsample, mask2former_head.py:180-182, does not), which flips
    threshold bits. Two static matmuls — MXU-friendly like
    ``jax.image.resize``'s own lowering."""
    h, w = int(hw[0]), int(hw[1])
    if (h, w) == (int(x.shape[1]), int(x.shape[2])):
        return x
    my = jnp.asarray(_interp_matrix(h, int(x.shape[1])), x.dtype)
    mx = jnp.asarray(_interp_matrix(w, int(x.shape[2])), x.dtype)
    return jnp.einsum("yh,bhwc,xw->byxc", my, x, mx)
