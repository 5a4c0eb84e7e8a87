"""Pallas TPU kernel for multi-scale deformable attention.

Placeholder dispatch for now: routes to the XLA gather implementation (the
correctness oracle) until the fused bilinear-gather kernel lands. The public
entry point keeps its final signature so call sites don't change.
"""

from __future__ import annotations


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    from rscotr_tpu.ops.ms_deform_attn import _ms_deform_attn_xla
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)
