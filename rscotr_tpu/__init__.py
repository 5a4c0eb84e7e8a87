"""RSCoTr-TPU: a TPU-native (JAX/XLA/Pallas) multi-task remote-sensing vision
framework with the capabilities of Li-Qingyun/RSCoTr.

One model holds a shared backbone (Swin-T / ResNet-50), a shared ChannelMapper
neck, a shared multi-scale deformable-attention transformer encoder, and three
task decoders (classification / DINO detection / Mask2Former segmentation),
co-trained on interleaved single-task batches.

Reference capability map: see SURVEY.md at the repo root. This is a from-
scratch TPU-first design — functional flax modules, params as pytrees, jitted
train steps with static shapes, pjit/shard_map data parallelism over a device
mesh, Pallas kernels for the hot ops.
"""

from rscotr_tpu.version import __version__

__all__ = ["__version__"]
