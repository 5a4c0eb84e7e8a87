"""ResNet backbone (flax.linen, NHWC).

Capability-equivalent of mmcv/torchvision ResNet-50 used by the reference's
single-task parity configs (configs/det/dino_4scale_r50_1x1_50e_dior.py,
configs/seg/RSCoTrSeg_3scale_r50_...py). Bottleneck, pytorch-style
(stride in the 3x3 conv), BN with frozen-stats option (mmdet norm_eval).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rscotr_tpu.config.registry import BACKBONES


class _BN(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=self.frozen or not train,
                            momentum=self.momentum, epsilon=self.epsilon,
                            name="bn")(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _BN(frozen=self.norm_eval, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _BN(frozen=self.norm_eval, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _BN(frozen=self.norm_eval, name="bn3")(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _BN(frozen=self.norm_eval,
                           name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


@BACKBONES.register_module(name="ResNet")
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1      # config parity; freezing applied by optimizer masks
    norm_eval: bool = True
    init_cfg: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None,
                 train: Optional[bool] = None):
        """``train`` only matters with norm_eval=False (running BN stats);
        every reference config freezes BN (norm_eval=True / requires_grad
        False), so the default path uses running averages — exact parity
        with mmdet's train-time BN eval mode."""
        if train is None:
            train = (not deterministic) if deterministic is not None \
                else False
        blocks = self.ARCH[self.depth][:self.num_stages]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _BN(frozen=self.norm_eval, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for si, nb in enumerate(blocks):
            stride = 1 if si == 0 else 2
            for bi in range(nb):
                x = Bottleneck(planes=planes,
                               stride=stride if bi == 0 else 1,
                               downsample=(bi == 0),
                               norm_eval=self.norm_eval, dtype=self.dtype,
                               name=f"layer{si + 1}_block{bi}")(x, train)
            if si in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
