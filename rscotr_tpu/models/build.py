"""Config -> module builders.

Translates reference-shaped config dicts (same ``type`` names as
/root/reference/configs/multi/MTL_slvlcls_...py) into flax modules.
Capability-equivalent of the reference's cross-library build shims
(/root/reference/mtl/model/build.py:7-88) with the mm registries collapsed
into explicit factories.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax.numpy as jnp

from rscotr_tpu.models.backbones.resnet import ResNet
from rscotr_tpu.models.backbones.swin import SwinTransformer
from rscotr_tpu.models.heads.cls_heads import MlvlClsHead, SlvlClsHead
from rscotr_tpu.models.heads.dino_head import DINOHead
from rscotr_tpu.models.heads.mask2former_head import Mask2FormerHead
from rscotr_tpu.models.layers.transformer import DeformableEncoder
from rscotr_tpu.models.mtl import MTL
from rscotr_tpu.models.necks.channel_mapper import ChannelMapper


def _pop_type(cfg: dict) -> tuple:
    cfg = copy.deepcopy(dict(cfg))
    return cfg.pop("type"), cfg


def build_backbone(cfg: dict, dtype=jnp.float32):
    t, c = _pop_type(cfg)
    if t == "SwinTransformer":
        return SwinTransformer(
            embed_dims=c.get("embed_dims", 96),
            depths=tuple(c.get("depths", (2, 2, 6, 2))),
            num_heads=tuple(c.get("num_heads", (3, 6, 12, 24))),
            window_size=c.get("window_size", 7),
            mlp_ratio=c.get("mlp_ratio", 4),
            qkv_bias=c.get("qkv_bias", True),
            qk_scale=c.get("qk_scale", None),
            drop_rate=c.get("drop_rate", 0.0),
            attn_drop_rate=c.get("attn_drop_rate", 0.0),
            drop_path_rate=c.get("drop_path_rate", 0.2),
            patch_norm=c.get("patch_norm", True),
            out_indices=tuple(c.get("out_indices", (0, 1, 2, 3))),
            with_cp=c.get("with_cp", False),
            convert_weights=c.get("convert_weights", True),
            init_cfg=c.get("init_cfg"),
            fused_window_attn=c.get("fused_window_attn", False),
            dtype=dtype)
    if t == "ResNet":
        return ResNet(depth=c.get("depth", 50),
                      num_stages=c.get("num_stages", 4),
                      out_indices=tuple(c.get("out_indices", (0, 1, 2, 3))),
                      frozen_stages=c.get("frozen_stages", 1),
                      norm_eval=c.get("norm_eval", True),
                      init_cfg=c.get("init_cfg"), dtype=dtype)
    raise KeyError(f"unknown backbone type {t}")


def build_neck(cfg: Optional[dict], dtype=jnp.float32):
    if cfg is None:
        return None
    t, c = _pop_type(cfg)
    if t == "ChannelMapper":
        return ChannelMapper(
            in_channels=tuple(c.get("in_channels")),
            out_channels=c.get("out_channels", 256),
            kernel_size=c.get("kernel_size", 1),
            num_outs=c.get("num_outs", 4),
            use_norm=c.get("norm_cfg") is not None,
            norm_groups=(c.get("norm_cfg") or {}).get("num_groups", 32),
            act="relu" if c.get("act_cfg") else None,
            dtype=dtype)
    raise KeyError(f"unknown neck type {t}")


def build_shared_encoder(cfg: dict, dtype=jnp.float32):
    t, c = _pop_type(cfg)
    assert t in ("DetrTransformerEncoder",), t
    layers = c.get("transformerlayers", {})
    attn = layers.get("attn_cfgs", {})
    ffn = layers.get("ffn_cfgs", {})
    return DeformableEncoder(
        num_layers=c.get("num_layers", 6),
        embed_dims=attn.get("embed_dims", 256),
        num_heads=attn.get("num_heads", 8),
        num_levels=attn.get("num_levels", 4),
        num_points=attn.get("num_points", 4),
        feedforward_channels=ffn.get("feedforward_channels", 2048),
        ffn_drop=ffn.get("ffn_drop", 0.0),
        dropout=attn.get("dropout", 0.0),
        with_cp=bool(c.get("with_cp", False)), dtype=dtype)


def build_cls_head(cfg: Optional[dict], dtype=jnp.float32):
    if cfg is None:
        return None
    t, c = _pop_type(cfg)
    if t == "SlvlClsHead":
        return SlvlClsHead(num_classes=c.get("num_classes", 45),
                           in_channels=c.get("in_channels", 768),
                           dtype=dtype)
    if t == "MlvlClsHead":
        pd = c.get("pixel_decoder", {}) or {}
        return MlvlClsHead(num_classes=c.get("num_classes", 45),
                           in_channels=c.get("in_channels", 256),
                           scheme=c.get("scheme", 5),
                           num_encoder_levels=pd.get("num_encoder_levels", 4),
                           strides=tuple(pd.get("strides", (8, 16, 32, 64))),
                           feat_channels=pd.get("feat_channels", 256),
                           dtype=dtype)
    raise KeyError(f"unknown cls head type {t}")


def build_bbox_head(cfg: Optional[dict], dtype=jnp.float32):
    if cfg is None:
        return None
    t, c = _pop_type(cfg)
    assert t == "DINOHead", t
    transformer = c.get("transformer", {})
    decoder = transformer.get("decoder", {})
    dec_layers = decoder.get("transformerlayers", {})
    attn_cfgs = dec_layers.get("attn_cfgs", [{}, {}])
    msda = attn_cfgs[1] if isinstance(attn_cfgs, (list, tuple)) else attn_cfgs
    ffn = dec_layers.get("ffn_cfgs", {})
    pe = c.get("positional_encoding", {})
    return DINOHead(
        num_classes=c.get("num_classes", 20),
        num_query=c.get("num_query", 600),
        embed_dims=msda.get("embed_dims", 256),
        num_decoder_layers=decoder.get("num_layers", 6),
        num_feature_levels=c.get("num_feature_levels", 4),
        num_heads=8,
        num_points=msda.get("num_points", 4),
        feedforward_channels=ffn.get("feedforward_channels", 2048),
        pos_temperature=pe.get("temperature", 20),
        sync_cls_avg_factor=c.get("sync_cls_avg_factor", True),
        dtype=dtype)


def build_seg_head(cfg: Optional[dict], dtype=jnp.float32):
    if cfg is None:
        return None
    t, c = _pop_type(cfg)
    assert t == "Mask2FormerHead", t
    td = c.get("transformer_decoder", {})
    tl = td.get("transformerlayers", {})
    attn = tl.get("attn_cfgs", {})
    ffn = tl.get("ffn_cfgs", {})
    pe = c.get("positional_encoding", {})
    return Mask2FormerHead(
        in_channels=tuple(c.get("in_channels", (96, 192, 384, 768))),
        feat_channels=c.get("feat_channels", 256),
        out_channels=c.get("out_channels", 256),
        num_classes=c.get("num_classes", 5),
        num_queries=c.get("num_queries", 100),
        num_transformer_feat_level=c.get("num_transformer_feat_level", 4),
        scheme=c.get("scheme", 1),
        num_heads=attn.get("num_heads", 8),
        num_decoder_layers=td.get("num_layers", 9),
        feedforward_channels=ffn.get("feedforward_channels", 2048),
        pos_temperature=pe.get("temperature", 10000), dtype=dtype)


def build_model(cfg: dict):
    """Build a model (MTL / DINO / RSCoTrSeg) from a reference-shaped
    model config.

    ``cfg['compute_dtype'] = 'bfloat16'`` switches every module's compute
    dtype (params stay f32 — flax param_dtype default; bf16 activations /
    matmuls are the TPU-natural equivalent of the reference's optional
    fp16 AMP hooks, SURVEY.md §2b fp16 row)."""
    cfg = copy.deepcopy(dict(cfg))
    t = cfg.get("type", "MTL")
    dtype = jnp.dtype(cfg.get("compute_dtype") or jnp.float32)
    if t == "MTL":
        neck_cfg = cfg.get("neck")
        return MTL(
            backbone=build_backbone(cfg["backbone"], dtype=dtype),
            neck=build_neck(neck_cfg, dtype=dtype),
            shared_encoder=build_shared_encoder(cfg["shared_encoder"],
                                                dtype=dtype),
            cls_head=build_cls_head(cfg.get("cls_head"), dtype=dtype),
            bbox_head=build_bbox_head(cfg.get("bbox_head"), dtype=dtype),
            seg_head=build_seg_head(cfg.get("seg_head"), dtype=dtype),
            neck_in_levels=len(neck_cfg["in_channels"]) if neck_cfg else 0,
        )
    if t == "DINO":
        from rscotr_tpu.models.dino import DINO
        neck_cfg = cfg.get("neck")
        enc_cfg = cfg.get("encoder") or cfg.get("shared_encoder")
        return DINO(
            backbone=build_backbone(cfg["backbone"], dtype=dtype),
            neck=build_neck(neck_cfg, dtype=dtype),
            bbox_head=build_bbox_head(cfg.get("bbox_head"), dtype=dtype),
            encoder=build_shared_encoder(enc_cfg, dtype=dtype),
            neck_in_levels=len(neck_cfg["in_channels"]) if neck_cfg else 0)
    if t == "RSCoTrSeg":
        from rscotr_tpu.models.rscotr_seg import RSCoTrSeg
        enc_cfg = cfg.get("encoder") or cfg.get("shared_encoder")
        seg_cfg = dict(cfg.get("seg_head") or cfg.get("decode_head"))
        head = build_seg_head(seg_cfg, dtype=dtype).clone(
            pixel_decoder_input_convs=True)
        return RSCoTrSeg(backbone=build_backbone(cfg["backbone"],
                                                 dtype=dtype),
                         seg_head=head,
                         encoder=build_shared_encoder(enc_cfg, dtype=dtype))
    raise KeyError(f"unknown model type {t}")
