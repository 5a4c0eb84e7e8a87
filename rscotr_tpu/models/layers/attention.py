"""Multi-head attention with DETR-style masking (flax.linen).

Capability-equivalent of mmcv's ``MultiheadAttention`` wrapper around
torch.nn.MultiheadAttention as used by the DINO decoder self-attention
(reference configs/multi/MTL_slvlcls_...py:82-86) and the Mask2Former
decoder (ibid:141-150). Batch-first (B, N, C).

Masking conventions (torch semantics):
* ``attn_mask``: bool (Nq, Nk) or (B*heads, Nq, Nk); True = NOT allowed.
* ``key_padding_mask``: bool (B, Nk); True = padded (ignored) key.
Fully-masked rows would produce NaNs in torch; the reference's Mask2Former
resets all-True mask rows before the call (mask2former_head.py:180-182) and
we keep a defensive uniform fallback for exactly-all-masked rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dropout: float = 0.0  # output dropout before residual (mmcv dropout_layer)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,
                 key: Optional[jnp.ndarray] = None,
                 value: Optional[jnp.ndarray] = None,
                 identity: Optional[jnp.ndarray] = None,
                 query_pos: Optional[jnp.ndarray] = None,
                 key_pos: Optional[jnp.ndarray] = None,
                 attn_mask: Optional[jnp.ndarray] = None,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and key is query:
            key_pos = query_pos
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key

        B, Nq, C = q.shape
        Nk = k.shape[1]
        H = self.num_heads
        hd = C // H

        qp = nn.Dense(C, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(C, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(C, dtype=self.dtype, name="v_proj")(value)
        qp = qp.reshape(B, Nq, H, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / jnp.sqrt(
            jnp.asarray(hd, dtype=qp.dtype))

        if attn_mask is not None:
            if attn_mask.ndim == 2:
                m = attn_mask[None, None]
            else:  # (B*H, Nq, Nk)
                m = attn_mask.reshape(B, H, Nq, Nk)
            logits = jnp.where(m, NEG_INF, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :],
                               NEG_INF, logits)

        # defensive: a fully-masked query row falls back to uniform attention
        all_masked = jnp.all(logits <= NEG_INF / 2, axis=-1, keepdims=True)
        logits = jnp.where(all_masked, 0.0, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out
