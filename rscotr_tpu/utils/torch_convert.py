"""PyTorch -> JAX weight conversion.

Parity-protocol tooling (SURVEY.md §6, BASELINE.md): convert the published
Swin-T ImageNet checkpoint and the reference's mm-format RSCoTr/DINO
checkpoints into our flax param trees so outputs can be compared within
tolerance.

Layout conventions converted:
* torch Linear weight (out, in)   -> flax Dense kernel (in, out)  [transpose]
* torch Conv2d weight (O, I, H, W)-> flax Conv kernel (H, W, I, O)
* torch LayerNorm/GN weight/bias  -> flax scale/bias
* original-Swin PatchMerging column order == ours by construction;
  mm-format (unfold-ordered) columns are permuted (see _unfold_perm).
* torch nn.MultiheadAttention in_proj (3E, E) -> split q/k/v Dense kernels.

No torch import is required to WRITE params — tensors arrive as numpy
(state dicts are loaded with torch on the caller side).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def t_lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _unfold_perm(C: int) -> np.ndarray:
    """mm PatchMerging unfold column order -> our block-concat order.

    unfold: col = c * 4 + pos, pos in row-major ((0,0),(0,1),(1,0),(1,1)).
    ours:   col = block * C + c, blocks ((0,0),(1,0),(0,1),(1,1)).
    """
    perm = np.zeros(4 * C, np.int64)
    block_pos = [0, 2, 1, 3]   # block i takes unfold pos block_pos[i]
    for b in range(4):
        for c in range(C):
            perm[b * C + c] = c * 4 + block_pos[b]
    return perm


def convert_swin_original(state: Dict[str, np.ndarray],
                          depths=(2, 2, 6, 2)) -> dict:
    """Original Swin repo layout ('layers.{s}.blocks.{b}...') -> our
    SwinTransformer param tree (dict under 'params')."""
    p: dict = {}

    def put(path, val):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(val)

    put(("patch_embed", "kernel"), t_conv(state["patch_embed.proj.weight"]))
    put(("patch_embed", "bias"), state["patch_embed.proj.bias"])
    if "patch_embed.norm.weight" in state:
        put(("patch_norm", "scale"), state["patch_embed.norm.weight"])
        put(("patch_norm", "bias"), state["patch_embed.norm.bias"])

    for s, depth in enumerate(depths):
        for b in range(depth):
            src = f"layers.{s}.blocks.{b}"
            dst = f"stage{s}_block{b}"
            put((dst, "norm1", "scale"), state[f"{src}.norm1.weight"])
            put((dst, "norm1", "bias"), state[f"{src}.norm1.bias"])
            put((dst, "attn", "qkv", "kernel"),
                t_lin(state[f"{src}.attn.qkv.weight"]))
            if f"{src}.attn.qkv.bias" in state:
                put((dst, "attn", "qkv", "bias"),
                    state[f"{src}.attn.qkv.bias"])
            put((dst, "attn", "relative_position_bias_table"),
                state[f"{src}.attn.relative_position_bias_table"])
            put((dst, "attn", "proj", "kernel"),
                t_lin(state[f"{src}.attn.proj.weight"]))
            put((dst, "attn", "proj", "bias"),
                state[f"{src}.attn.proj.bias"])
            put((dst, "norm2", "scale"), state[f"{src}.norm2.weight"])
            put((dst, "norm2", "bias"), state[f"{src}.norm2.bias"])
            put((dst, "mlp_fc1", "kernel"),
                t_lin(state[f"{src}.mlp.fc1.weight"]))
            put((dst, "mlp_fc1", "bias"), state[f"{src}.mlp.fc1.bias"])
            put((dst, "mlp_fc2", "kernel"),
                t_lin(state[f"{src}.mlp.fc2.weight"]))
            put((dst, "mlp_fc2", "bias"), state[f"{src}.mlp.fc2.bias"])
        dkey = f"layers.{s}.downsample"
        if f"{dkey}.reduction.weight" in state:
            put((f"downsample{s}", "norm", "scale"),
                state[f"{dkey}.norm.weight"])
            put((f"downsample{s}", "norm", "bias"),
                state[f"{dkey}.norm.bias"])
            put((f"downsample{s}", "reduction", "kernel"),
                t_lin(state[f"{dkey}.reduction.weight"]))
    # stage-output norms (mm checkpoints carry norm0..norm3; the ImageNet
    # checkpoint has a single final 'norm' -> map it to the last stage)
    for s in range(len(depths)):
        for key in (f"norm{s}.weight", "norm.weight"
                    if s == len(depths) - 1 else None):
            if key and key in state:
                put((f"out_norm{s}", "scale"), state[key])
                put((f"out_norm{s}", "bias"),
                    state[key.replace("weight", "bias")])
                break
    return p


def convert_swin_mm(state: Dict[str, np.ndarray],
                    depths=(2, 2, 6, 2)) -> dict:
    """mm-format Swin ('stages.{s}.blocks.{b}.attn.w_msa...', unfold
    PatchMerging) -> our tree. Accepts keys with or without a leading
    'backbone.'."""
    state = {k.removeprefix("backbone."): v for k, v in state.items()}
    remapped: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        k2 = (k.replace("stages.", "layers.")
               .replace(".attn.w_msa.", ".attn.")
               .replace(".ffn.layers.0.0.", ".mlp.fc1.")
               .replace(".ffn.layers.1.", ".mlp.fc2."))
        remapped[k2] = v
    # fix unfold ordering on downsample reductions + their norms
    for s in range(len(depths)):
        rk = f"layers.{s}.downsample.reduction.weight"
        nk = f"layers.{s}.downsample.norm.weight"
        if rk in remapped:
            C = remapped[rk].shape[1] // 4
            perm = _unfold_perm(C)
            remapped[rk] = remapped[rk][:, perm]
            for suffix in ("weight", "bias"):
                key = f"layers.{s}.downsample.norm.{suffix}"
                if key in remapped:
                    remapped[key] = remapped[key][perm]
    return convert_swin_original(remapped, depths)


# ---------------------------------------------------------------------------
# Full mm-format MTL checkpoint (backbone + neck + shared encoder + heads)
# ---------------------------------------------------------------------------

def _put(tree: dict, path, val):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = np.asarray(val)


def _ln(tree, path, state, key):
    """torch LayerNorm/GroupNorm {key}.weight/bias -> {path}.scale/bias."""
    _put(tree, path + ("scale",), state[f"{key}.weight"])
    _put(tree, path + ("bias",), state[f"{key}.bias"])


def _dense(tree, path, state, key):
    _put(tree, path + ("kernel",), t_lin(state[f"{key}.weight"]))
    if f"{key}.bias" in state:
        _put(tree, path + ("bias",), state[f"{key}.bias"])


def _conv(tree, path, state, key):
    _put(tree, path + ("kernel",), t_conv(state[f"{key}.weight"]))
    if f"{key}.bias" in state:
        _put(tree, path + ("bias",), state[f"{key}.bias"])


def _mha(tree, path, state, key):
    """torch nn.MultiheadAttention -> our q/k/v/out_proj Dense quads.

    in_proj_weight rows are [q; k; v] each (C, C)."""
    w = state[f"{key}.in_proj_weight"]
    C = w.shape[1]
    names = ("q_proj", "k_proj", "v_proj")
    for i, nm in enumerate(names):
        _put(tree, path + (nm, "kernel"), t_lin(w[i * C:(i + 1) * C]))
    if f"{key}.in_proj_bias" in state:
        b = state[f"{key}.in_proj_bias"]
        for i, nm in enumerate(names):
            _put(tree, path + (nm, "bias"), b[i * C:(i + 1) * C])
    _dense(tree, path + ("out_proj",), state, f"{key}.out_proj")


def _msda(tree, path, state, key):
    """mmcv MultiScaleDeformableAttention projections."""
    for nm in ("sampling_offsets", "attention_weights", "value_proj",
               "output_proj"):
        _dense(tree, path + (nm,), state, f"{key}.{nm}")


def _ffn(tree, path, state, key):
    """mmcv FFN: layers.0.0 = fc0 (Linear inside Sequential(act)),
    layers.1 = fc1."""
    _dense(tree, path + ("fc0",), state, f"{key}.layers.0.0")
    _dense(tree, path + ("fc1",), state, f"{key}.layers.1")


def convert_channel_mapper(state: Dict[str, np.ndarray],
                           prefix: str = "neck.") -> dict:
    """mmdet ChannelMapper ('convs.{i}.conv/gn', 'extra_convs.{j}') ->
    our ChannelMapper tree (convs_{i}/gn_{i}/extra_convs_{j}/extra_gn_{j})."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    p: dict = {}
    i = 0
    while f"convs.{i}.conv.weight" in state:
        _conv(p, (f"convs_{i}",), state, f"convs.{i}.conv")
        if f"convs.{i}.gn.weight" in state:
            _ln(p, (f"gn_{i}",), state, f"convs.{i}.gn")
        i += 1
    j = 0
    while f"extra_convs.{j}.conv.weight" in state:
        _conv(p, (f"extra_convs_{j}",), state, f"extra_convs.{j}.conv")
        if f"extra_convs.{j}.gn.weight" in state:
            _ln(p, (f"extra_gn_{j}",), state, f"extra_convs.{j}.gn")
        j += 1
    return p


def convert_deformable_encoder(state: Dict[str, np.ndarray],
                               prefix: str = "shared_encoder.") -> dict:
    """mmcv DetrTransformerEncoder ('layers.{i}.attentions.0...', ffns,
    norms) -> our DeformableEncoder tree (layers_{i}.self_attn/ffn/norm*).

    Reference layer order: MSDeformAttn -> norms.0 -> FFN -> norms.1
    (configs/multi/MTL_slvlcls_...py:44-49)."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    p: dict = {}
    i = 0
    while f"layers.{i}.norms.0.weight" in state:
        lp = (f"layers_{i}",)
        _msda(p, lp + ("self_attn",), state, f"layers.{i}.attentions.0")
        _ffn(p, lp + ("ffn",), state, f"layers.{i}.ffns.0")
        _ln(p, lp + ("norm1",), state, f"layers.{i}.norms.0")
        _ln(p, lp + ("norm2",), state, f"layers.{i}.norms.1")
        i += 1
    return p


def convert_cls_head(state: Dict[str, np.ndarray],
                     prefix: str = "cls_head.") -> dict:
    """SlvlClsHead / MlvlClsHead ('fc', optional 'pixel_decoder' +
    'out_proj')."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    p: dict = {}
    if "fc.weight" in state:
        _dense(p, ("fc",), state, "fc")
    if "pixel_decoder.level_encoding.weight" in state:
        _put(p, ("pixel_decoder", "level_encoding"),
             state["pixel_decoder.level_encoding.weight"])
    if "out_proj.weight" in state:
        # torch Linear(n, 1) weight (1, n) -> our (n, 1) param
        _put(p, ("out_proj_w",), t_lin(state["out_proj.weight"]))
        _put(p, ("out_proj_b",), state["out_proj.bias"])
    return p


def convert_dino_head(state: Dict[str, np.ndarray],
                      prefix: str = "bbox_head.") -> dict:
    """Reference DINOHead + DinoTransformer(+Decoder)
    (models/multi/bbox_head/dino_head.py:40-55, transformer.py:135-273)
    -> our DINOHead tree."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    p: dict = {}
    _put(p, ("label_embedding",), state["label_embedding.weight"])
    _put(p, ("level_embeds",), state["transformer.level_embeds"])
    _put(p, ("query_embed",), state["transformer.query_embed.weight"])
    _dense(p, ("enc_output",), state, "transformer.enc_output")
    _ln(p, ("enc_output_norm",), state, "transformer.enc_output_norm")
    i = 0
    while f"cls_branches.{i}.weight" in state:
        _dense(p, (f"cls_branches_{i}",), state, f"cls_branches.{i}")
        for j, fc in enumerate((0, 2, 4)):
            _dense(p, (f"reg_branches_{i}", f"fc{j}"), state,
                   f"reg_branches.{i}.{fc}")
        i += 1
    # ref_point_head: build_MLP ModuleList of Linear (transformer.py:17-28)
    j = 0
    while f"transformer.decoder.ref_point_head.layers.{j}.weight" in state:
        _dense(p, ("ref_point_head", f"layers_{j}"), state,
               f"transformer.decoder.ref_point_head.layers.{j}")
        j += 1
    _ln(p, ("decoder_norm",), state, "transformer.decoder.norm")
    i = 0
    while f"transformer.decoder.layers.{i}.norms.0.weight" in state:
        src = f"transformer.decoder.layers.{i}"
        lp = (f"decoder_layers_{i}",)
        # order: self_attn(MHA) -> norms.0 -> cross_attn(MSDA) -> norms.1
        # -> ffn -> norms.2 (configs/multi/MTL_slvlcls_...py:82-97)
        _mha(p, lp + ("self_attn",), state, f"{src}.attentions.0.attn")
        _msda(p, lp + ("cross_attn",), state, f"{src}.attentions.1")
        _ffn(p, lp + ("ffn",), state, f"{src}.ffns.0")
        for n in range(3):
            _ln(p, lp + (f"norm{n + 1}",), state, f"{src}.norms.{n}")
        i += 1
    return p


def convert_mask2former_head(state: Dict[str, np.ndarray],
                             prefix: str = "seg_head.") -> dict:
    """Reference Mask2FormerHead (models/multi/seg_head/
    mask2former_head.py:40-88) + MlvlSegPixelDecoder (pixel_decoder.py:30-70)
    -> our Mask2FormerHead tree."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    p: dict = {}
    _put(p, ("query_embed",), state["query_embed.weight"])
    _put(p, ("query_feat",), state["query_feat.weight"])
    _put(p, ("level_embed",), state["level_embed.weight"])
    for j, seq in enumerate((0, 2, 4)):
        _dense(p, ("mask_embed", f"layers_{j}"), state, f"mask_embed.{seq}")
    if "cls_embed.weight" in state:
        _dense(p, ("cls_embed",), state, "cls_embed")
    _ln(p, ("post_norm",), state, "transformer_decoder.post_norm")
    i = 0
    while f"transformer_decoder.layers.{i}.norms.0.weight" in state:
        src = f"transformer_decoder.layers.{i}"
        lp = (f"decoder_layers_{i}",)
        # order: cross_attn -> norms.0 -> self_attn -> norms.1 -> ffn ->
        # norms.2 (configs/multi/MTL_slvlcls_...py:138-152)
        _mha(p, lp + ("cross_attn",), state, f"{src}.attentions.0.attn")
        _mha(p, lp + ("self_attn",), state, f"{src}.attentions.1.attn")
        _ffn(p, lp + ("ffn",), state, f"{src}.ffns.0")
        for n in range(3):
            _ln(p, lp + (f"norm{n + 1}",), state, f"{src}.norms.{n}")
        i += 1
    # pixel decoder
    pd = "pixel_decoder."
    _put(p, ("pixel_decoder", "level_encoding"),
         state[f"{pd}level_encoding.weight"])
    _conv(p, ("pixel_decoder", "mask_feature"), state, f"{pd}mask_feature")
    # lateral/output convs: reference appends them in DESCENDING input-level
    # order; our names carry the input-level index directly.
    lat_keys = sorted(
        int(k.split(".")[2]) for k in state
        if k.startswith(f"{pd}lateral_convs.") and k.endswith(".conv.weight"))
    num_fpn = len(lat_keys)
    for k in lat_keys:
        lvl = num_fpn - 1 - k
        _conv(p, ("pixel_decoder", f"lateral_conv_{lvl}"), state,
              f"{pd}lateral_convs.{k}.conv")
        _ln(p, ("pixel_decoder", f"lateral_gn_{lvl}", "GroupNorm_0"),
            state, f"{pd}lateral_convs.{k}.gn")
        _conv(p, ("pixel_decoder", f"output_conv_{lvl}"), state,
              f"{pd}output_convs.{k}.conv")
        _ln(p, ("pixel_decoder", f"output_gn_{lvl}", "GroupNorm_0"),
            state, f"{pd}output_convs.{k}.gn")
    i = 0
    while f"{pd}input_convs.{i}.conv.weight" in state:
        _conv(p, ("pixel_decoder", f"input_conv_{i}"), state,
              f"{pd}input_convs.{i}.conv")
        _ln(p, ("pixel_decoder", f"input_gn_{i}", "GroupNorm_0"), state,
            f"{pd}input_convs.{i}.gn")
        i += 1
    return p


def convert_resnet(state: Dict[str, np.ndarray],
                   prefix: str = "backbone.") -> Tuple[dict, dict]:
    """mm/torchvision ResNet state dict -> (params, batch_stats) trees for
    backbones/resnet.py. Key layout: conv1/bn1, layer{s}.{b}.conv{i}/bn{i},
    layer{s}.{b}.downsample.0 (conv) / .1 (bn) — identical in torchvision
    and mmcv ResNet (the reference's r50 configs load torchvision weights,
    /root/reference/configs/det/dino_4scale_r50_1x1_50e_dior.py:8-10).
    Running BN stats land in batch_stats (frozen-BN parity: mmdet
    norm_eval=True runs BN in eval mode during training)."""
    state = {k.removeprefix(prefix): v for k, v in state.items()
             if k.startswith(prefix)}
    params: dict = {}
    stats: dict = {}

    def bn(path, key):
        _ln(params, path + ("bn",), state, key)
        _put(stats, path + ("bn", "mean"), state[f"{key}.running_mean"])
        _put(stats, path + ("bn", "var"), state[f"{key}.running_var"])

    _conv(params, ("conv1",), state, "conv1")
    bn(("bn1",), "bn1")
    s = 1
    while f"layer{s}.0.conv1.weight" in state:
        b = 0
        while f"layer{s}.{b}.conv1.weight" in state:
            bp = (f"layer{s}_block{b}",)
            for i in (1, 2, 3):
                _conv(params, bp + (f"conv{i}",), state,
                      f"layer{s}.{b}.conv{i}")
                bn(bp + (f"bn{i}",), f"layer{s}.{b}.bn{i}")
            if f"layer{s}.{b}.downsample.0.weight" in state:
                _conv(params, bp + ("downsample_conv",), state,
                      f"layer{s}.{b}.downsample.0")
                bn(bp + ("downsample_bn",), f"layer{s}.{b}.downsample.1")
            b += 1
        s += 1
    return params, stats


def convert_mtl_checkpoint(state: Dict[str, np.ndarray],
                           depths=(2, 2, 6, 2)) -> dict:
    """Full mm-format MTL state dict -> our MTL param tree (the dict that
    belongs under params['params']). Enables the BASELINE.md parity
    protocol on the published HF checkpoint
    (reference multitask_learner.py:308-353 key layout)."""
    out: dict = {}
    if any(k.startswith("backbone.") for k in state):
        out["backbone"] = convert_swin_mm(
            {k: v for k, v in state.items() if k.startswith("backbone.")},
            depths=depths)
    if any(k.startswith("neck.") for k in state):
        out["neck"] = convert_channel_mapper(state)
    if any(k.startswith("shared_encoder.") for k in state):
        out["shared_encoder"] = convert_deformable_encoder(state)
    if any(k.startswith("cls_head.") for k in state):
        out["cls_head"] = convert_cls_head(state)
    if any(k.startswith("bbox_head.") for k in state):
        out["bbox_head"] = convert_dino_head(state)
    if any(k.startswith("seg_head.") for k in state):
        out["seg_head"] = convert_mask2former_head(state)
    return out


def merge_into_params(params: dict, sub: dict, top: str) -> dict:
    """Place a converted subtree under params['params'][top], keeping any
    keys the checkpoint did not provide (non-strict load)."""
    import jax

    out = jax.tree.map(lambda x: x, params)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                if k in dst and hasattr(dst[k], "shape") and \
                        tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {top}/{k}: "
                        f"{dst[k].shape} vs {np.shape(v)}")
                dst[k] = v

    merge(out["params"][top], sub)
    return out
