"""Multi-scale deformable attention sampling core (JAX/XLA + Pallas).

This replaces the mmcv CUDA op ``MultiScaleDeformableAttention``'s
``ms_deform_attn_forward/backward`` (the reference's hottest kernel — used by
the shared encoder, the DINO decoder cross-attention, and the standalone
pixel decoders; see /root/reference/configs/multi/MTL_slvlcls_...py:40,87-90).

Sampling semantics match ``F.grid_sample(align_corners=False,
padding_mode='zeros')`` on per-level (H, W) value maps with sampling
locations normalized to [0, 1]:  ``x_pix = loc_x * W - 0.5`` and bilinear
corners outside the map contribute zero.

Design notes (TPU-first):
* ``spatial_shapes`` is a STATIC tuple of (H, W) — per-level slicing is
  static, shapes fixed, XLA-friendly.
* The XLA path is pure gathers + elementwise math; autodiff gives the
  backward scatter-add for free.
* A fused Pallas kernel lives in rscotr_tpu/ops/pallas/ and is dispatched via
  ``impl='pallas'`` (default 'auto' picks pallas on TPU for supported shapes).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   impl: str = "auto") -> jnp.ndarray:
    """Multi-scale deformable attention aggregation.

    Args:
        value: (B, num_value, num_heads, head_dim); num_value = sum(H*W).
        spatial_shapes: static ((H, W), ...) per level.
        sampling_locations: (B, num_query, num_heads, num_levels, num_points,
            2) in [0, 1] per level ((x, y) order).
        attention_weights: (B, num_query, num_heads, num_levels, num_points),
            already softmax-normalized over (levels * points).
    Returns:
        (B, num_query, num_heads * head_dim)
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "auto":
        impl = "pallas" if _pallas_supported(value) else "xla"
    if impl == "pallas":
        from rscotr_tpu.ops.pallas.ms_deform_attn_kernel import \
            ms_deform_attn_pallas
        return ms_deform_attn_pallas(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)


def _pallas_supported(value: jnp.ndarray) -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnums=(1,))
def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                        attention_weights):
    B, num_value, num_heads, head_dim = value.shape
    _, num_query, _, num_levels, num_points, _ = sampling_locations.shape
    assert num_levels == len(spatial_shapes)
    assert num_value == sum(h * w for h, w in spatial_shapes)

    compute_dtype = value.dtype
    out = jnp.zeros((B, num_heads, num_query, head_dim), dtype=jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        # (B, H*W, heads, dim) -> (B, heads, H*W, dim)
        v = jax.lax.dynamic_slice_in_dim(value, start, H * W, axis=1)
        v = jnp.transpose(v, (0, 2, 1, 3))
        start += H * W

        loc = sampling_locations[:, :, :, lvl]        # (B, Q, h, P, 2)
        w_att = attention_weights[:, :, :, lvl]       # (B, Q, h, P)
        # grid_sample(align_corners=False): pixel coords
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = jnp.zeros((B, num_query, num_heads, num_points, head_dim),
                        dtype=jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0i + dx
                yi = y0i + dy
                wcorner = (fx if dx else (1.0 - fx)) * \
                          (fy if dy else (1.0 - fy))
                valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
                # (B, Q, h, P) -> (B, h, Q*P)
                idx_t = jnp.transpose(idx, (0, 2, 1, 3)).reshape(
                    B, num_heads, num_query * num_points)
                g = jnp.take_along_axis(
                    v, idx_t[..., None], axis=2)      # (B, h, Q*P, dim)
                g = g.reshape(B, num_heads, num_query, num_points, head_dim)
                g = jnp.transpose(g, (0, 2, 1, 3, 4))  # (B, Q, h, P, dim)
                wc = (wcorner * valid.astype(jnp.float32))[..., None]
                acc = acc + g.astype(jnp.float32) * wc
        # weighted sum over points
        contrib = jnp.einsum("bqhpd,bqhp->bhqd", acc,
                             w_att.astype(jnp.float32))
        out = out + contrib

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(
        B, num_query, num_heads * head_dim)
    return out.astype(compute_dtype)


def ms_deform_attn_reference_numpy(value, spatial_shapes, sampling_locations,
                                   attention_weights):
    """Slow numpy oracle for tests (direct transliteration of the math)."""
    import numpy as np

    B, _, num_heads, head_dim = value.shape
    _, num_query, _, num_levels, num_points, _ = sampling_locations.shape
    out = np.zeros((B, num_query, num_heads, head_dim), dtype=np.float64)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = np.asarray(value[:, start:start + H * W], dtype=np.float64)
        v = v.reshape(B, H, W, num_heads, head_dim)
        start += H * W
        for b in range(B):
            for q in range(num_query):
                for h in range(num_heads):
                    for p in range(num_points):
                        lx, ly = np.asarray(
                            sampling_locations[b, q, h, lvl, p],
                            dtype=np.float64)
                        aw = float(attention_weights[b, q, h, lvl, p])
                        x = lx * W - 0.5
                        y = ly * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        s = np.zeros(head_dim)
                        for dy in (0, 1):
                            for dx in (0, 1):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < W and 0 <= yi < H:
                                    w = (fx if dx else 1 - fx) * \
                                        (fy if dy else 1 - fy)
                                    s += w * v[b, yi, xi, h]
                        out[b, q, h] += aw * s
    return out.reshape(B, num_query, num_heads * head_dim)
