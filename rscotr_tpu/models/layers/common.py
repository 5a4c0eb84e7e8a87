"""Common neural-net bricks (flax.linen).

Capability-equivalents of the mmcv bricks the reference composes
(FFN, build_MLP, DropPath; reference configs/multi/MTL_slvlcls_...py:41-50,
models/multi/bbox_head/transformer.py:17-28). Batch-first (B, N, C).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class Mlp(nn.Module):
    """build_MLP equivalent: Linear-ReLU x (num_layers-1) -> Linear."""
    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         name=f"layers_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layers_{self.num_layers - 1}")(x)


class FFN(nn.Module):
    """mmcv FFN: 2 fcs, act between, residual add, dropout."""
    embed_dims: int = 256
    feedforward_channels: int = 2048
    num_fcs: int = 2
    ffn_drop: float = 0.0
    act: Callable = nn.relu
    add_identity: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None, deterministic: bool = True):
        out = x
        for i in range(self.num_fcs - 1):
            out = nn.Dense(self.feedforward_channels, dtype=self.dtype,
                           name=f"fc{i}")(out)
            out = self.act(out)
            out = nn.Dropout(self.ffn_drop)(out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       name=f"fc{self.num_fcs - 1}")(out)
        out = nn.Dropout(self.ffn_drop)(out, deterministic=deterministic)
        if not self.add_identity:
            return out
        if identity is None:
            identity = x
        return identity + out


class DropPath(nn.Module):
    """Stochastic depth per sample (timm semantics, used by Swin)."""
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask.astype(x.dtype) / keep


class GroupNorm2d(nn.Module):
    """GroupNorm over NHWC feature maps (mmcv GN default eps 1e-5)."""
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups,
                            epsilon=self.epsilon)(x)


def drop_path_rates(drop_path_rate: float, depths: Sequence[int]):
    """Linearly increasing stochastic-depth schedule across all blocks."""
    total = sum(depths)
    rates = [float(drop_path_rate) * i / max(total - 1, 1)
             for i in range(total)]
    out, k = [], 0
    for d in depths:
        out.append(rates[k:k + d])
        k += d
    return out
