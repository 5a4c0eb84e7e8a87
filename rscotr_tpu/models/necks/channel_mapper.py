"""ChannelMapper neck (flax.linen, NHWC).

Capability-equivalent of mmdet ``ChannelMapper`` as configured by the
reference (configs/multi/MTL_slvlcls_...py:26-33): 1x1 convs with GN(32), no
activation, over the last 3 backbone levels, plus one extra 3x3 stride-2 conv
on the last input to emit the 4th (stride-64) level.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import NECKS


@NECKS.register_module(name="ChannelMapper")
class ChannelMapper(nn.Module):
    in_channels: Sequence[int] = (192, 384, 768)
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: int = 4
    norm_groups: int = 32          # norm_cfg GN(32)
    use_norm: bool = True
    act: Optional[str] = None      # act_cfg=None in the reference config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        """feats: tuple of NHWC maps (len == len(in_channels))."""
        assert len(feats) == len(self.in_channels)
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        outs = []
        for i, f in enumerate(feats):
            x = nn.Conv(self.out_channels, (k, k), padding=pad,
                        use_bias=not self.use_norm, dtype=self.dtype,
                        name=f"convs_{i}")(f)
            if self.use_norm:
                x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                 name=f"gn_{i}")(x)
            if self.act == "relu":
                x = nn.relu(x)
            outs.append(x)
        # extra levels from the last INPUT feature (mmdet extra_convs source
        # 'on_input' for DETR-family configs)
        src = feats[-1]
        for j in range(self.num_outs - len(feats)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        use_bias=not self.use_norm, dtype=self.dtype,
                        name=f"extra_convs_{j}")(src)
            if self.use_norm:
                x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                                 name=f"extra_gn_{j}")(x)
            if self.act == "relu":
                x = nn.relu(x)
            outs.append(x)
            src = x
        return tuple(outs)
