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


# ---------------------------------------------------------------------------
# JAX -> torch/mm reverse conversion (VERDICT r2 next #6)
#
# Emits reference-layout state dicts (multitask_learner.py:308-353 key
# naming) from our flax trees so rebuilt/trained checkpoints are
# consumable by the reference stack, and the BASELINE.md accuracy-parity
# protocol is executable the day egress exists. Exact inverses of the
# convert_* functions above — tests/test_convert_full.py round-trips
# torch -> JAX -> torch bit-equal.
# ---------------------------------------------------------------------------

def _flat(tree: dict, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat(v, path + (k,))
        else:
            yield path + (k,), np.asarray(v)


def _r_ln(out, key, sub):
    out[f"{key}.weight"] = np.asarray(sub["scale"])
    out[f"{key}.bias"] = np.asarray(sub["bias"])


def _r_dense(out, key, sub):
    out[f"{key}.weight"] = t_lin(np.asarray(sub["kernel"]))
    if "bias" in sub:
        out[f"{key}.bias"] = np.asarray(sub["bias"])


def _r_conv(out, key, sub):
    out[f"{key}.weight"] = np.ascontiguousarray(
        np.asarray(sub["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in sub:
        out[f"{key}.bias"] = np.asarray(sub["bias"])


def _r_mha(out, key, sub):
    out[f"{key}.in_proj_weight"] = np.concatenate(
        [t_lin(np.asarray(sub[nm]["kernel"]))
         for nm in ("q_proj", "k_proj", "v_proj")], axis=0)
    if "bias" in sub["q_proj"]:
        out[f"{key}.in_proj_bias"] = np.concatenate(
            [np.asarray(sub[nm]["bias"])
             for nm in ("q_proj", "k_proj", "v_proj")])
    _r_dense(out, f"{key}.out_proj", sub["out_proj"])


def _r_msda(out, key, sub):
    for nm in ("sampling_offsets", "attention_weights", "value_proj",
               "output_proj"):
        _r_dense(out, f"{key}.{nm}", sub[nm])


def _r_ffn(out, key, sub):
    _r_dense(out, f"{key}.layers.0.0", sub["fc0"])
    _r_dense(out, f"{key}.layers.1", sub["fc1"])


def reverse_swin_original(tree: dict, depths=(2, 2, 6, 2),
                          out_norm_names: Optional[dict] = None) -> dict:
    """Our SwinTransformer tree -> original-repo key layout.
    ``out_norm_names``: stage -> key base (default norm{s}; the ImageNet
    single-norm layout passes {last: 'norm'})."""
    out: Dict[str, np.ndarray] = {}
    out["patch_embed.proj.weight"] = np.ascontiguousarray(
        np.asarray(tree["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    out["patch_embed.proj.bias"] = np.asarray(tree["patch_embed"]["bias"])
    if "patch_norm" in tree:
        _r_ln(out, "patch_embed.norm", tree["patch_norm"])
    for s, depth in enumerate(depths):
        for b in range(depth):
            blk = tree[f"stage{s}_block{b}"]
            dst = f"layers.{s}.blocks.{b}"
            _r_ln(out, f"{dst}.norm1", blk["norm1"])
            _r_ln(out, f"{dst}.norm2", blk["norm2"])
            _r_dense(out, f"{dst}.attn.qkv", blk["attn"]["qkv"])
            out[f"{dst}.attn.relative_position_bias_table"] = \
                np.asarray(blk["attn"]["relative_position_bias_table"])
            _r_dense(out, f"{dst}.attn.proj", blk["attn"]["proj"])
            _r_dense(out, f"{dst}.mlp.fc1", blk["mlp_fc1"])
            _r_dense(out, f"{dst}.mlp.fc2", blk["mlp_fc2"])
        if f"downsample{s}" in tree:
            ds = tree[f"downsample{s}"]
            _r_ln(out, f"layers.{s}.downsample.norm", ds["norm"])
            _r_dense(out, f"layers.{s}.downsample.reduction",
                     ds["reduction"])
    for s in range(len(depths)):
        if f"out_norm{s}" in tree:
            name = (out_norm_names or {}).get(s, f"norm{s}")
            _r_ln(out, name, tree[f"out_norm{s}"])
    return out


def reverse_swin_mm(tree: dict, depths=(2, 2, 6, 2)) -> dict:
    """Our SwinTransformer tree -> mm-format keys ('stages.{s}.blocks.{b}
    .attn.w_msa...', unfold-ordered PatchMerging)."""
    orig = reverse_swin_original(tree, depths)
    out: Dict[str, np.ndarray] = {}
    for k, v in orig.items():
        # 'layers.' -> 'stages.' FIRST: the later '.ffn.layers.0.0.'
        # segments must not be renamed to 'ffn.stages.'
        k2 = (k.replace("layers.", "stages.")
               .replace(".mlp.fc1.", ".ffn.layers.0.0.")
               .replace(".mlp.fc2.", ".ffn.layers.1.")
               .replace(".attn.", ".attn.w_msa."))
        out[k2] = v
    for s in range(len(depths)):
        rk = f"stages.{s}.downsample.reduction.weight"
        if rk in out:
            C = out[rk].shape[1] // 4
            inv = np.argsort(_unfold_perm(C))
            out[rk] = out[rk][:, inv]
            for suffix in ("weight", "bias"):
                key = f"stages.{s}.downsample.norm.{suffix}"
                if key in out:
                    out[key] = out[key][inv]
    return out


def reverse_channel_mapper(tree: dict, prefix: str = "neck.") -> dict:
    out: Dict[str, np.ndarray] = {}
    i = 0
    while f"convs_{i}" in tree:
        _r_conv(out, f"{prefix}convs.{i}.conv", tree[f"convs_{i}"])
        if f"gn_{i}" in tree:
            _r_ln(out, f"{prefix}convs.{i}.gn", tree[f"gn_{i}"])
        i += 1
    j = 0
    while f"extra_convs_{j}" in tree:
        _r_conv(out, f"{prefix}extra_convs.{j}.conv",
                tree[f"extra_convs_{j}"])
        if f"extra_gn_{j}" in tree:
            _r_ln(out, f"{prefix}extra_convs.{j}.gn",
                  tree[f"extra_gn_{j}"])
        j += 1
    return out


def reverse_deformable_encoder(tree: dict,
                               prefix: str = "shared_encoder.") -> dict:
    out: Dict[str, np.ndarray] = {}
    i = 0
    while f"layers_{i}" in tree:
        lyr = tree[f"layers_{i}"]
        src = f"{prefix}layers.{i}"
        _r_msda(out, f"{src}.attentions.0", lyr["self_attn"])
        _r_ffn(out, f"{src}.ffns.0", lyr["ffn"])
        _r_ln(out, f"{src}.norms.0", lyr["norm1"])
        _r_ln(out, f"{src}.norms.1", lyr["norm2"])
        i += 1
    return out


def reverse_cls_head(tree: dict, prefix: str = "cls_head.") -> dict:
    out: Dict[str, np.ndarray] = {}
    if "fc" in tree:
        _r_dense(out, f"{prefix}fc", tree["fc"])
    if "pixel_decoder" in tree and "level_encoding" in tree["pixel_decoder"]:
        out[f"{prefix}pixel_decoder.level_encoding.weight"] = \
            np.asarray(tree["pixel_decoder"]["level_encoding"])
    if "out_proj_w" in tree:
        out[f"{prefix}out_proj.weight"] = t_lin(
            np.asarray(tree["out_proj_w"]))
        out[f"{prefix}out_proj.bias"] = np.asarray(tree["out_proj_b"])
    return out


def reverse_dino_head(tree: dict, prefix: str = "bbox_head.") -> dict:
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}label_embedding.weight"] = \
        np.asarray(tree["label_embedding"])
    out[f"{prefix}transformer.level_embeds"] = \
        np.asarray(tree["level_embeds"])
    out[f"{prefix}transformer.query_embed.weight"] = \
        np.asarray(tree["query_embed"])
    _r_dense(out, f"{prefix}transformer.enc_output", tree["enc_output"])
    _r_ln(out, f"{prefix}transformer.enc_output_norm",
          tree["enc_output_norm"])
    i = 0
    while f"cls_branches_{i}" in tree:
        _r_dense(out, f"{prefix}cls_branches.{i}",
                 tree[f"cls_branches_{i}"])
        for j, fc in enumerate((0, 2, 4)):
            _r_dense(out, f"{prefix}reg_branches.{i}.{fc}",
                     tree[f"reg_branches_{i}"][f"fc{j}"])
        i += 1
    j = 0
    while f"layers_{j}" in tree.get("ref_point_head", {}):
        _r_dense(out,
                 f"{prefix}transformer.decoder.ref_point_head.layers.{j}",
                 tree["ref_point_head"][f"layers_{j}"])
        j += 1
    _r_ln(out, f"{prefix}transformer.decoder.norm", tree["decoder_norm"])
    i = 0
    while f"decoder_layers_{i}" in tree:
        lyr = tree[f"decoder_layers_{i}"]
        src = f"{prefix}transformer.decoder.layers.{i}"
        _r_mha(out, f"{src}.attentions.0.attn", lyr["self_attn"])
        _r_msda(out, f"{src}.attentions.1", lyr["cross_attn"])
        _r_ffn(out, f"{src}.ffns.0", lyr["ffn"])
        for n in range(3):
            _r_ln(out, f"{src}.norms.{n}", lyr[f"norm{n + 1}"])
        i += 1
    return out


def reverse_mask2former_head(tree: dict,
                             prefix: str = "seg_head.") -> dict:
    out: Dict[str, np.ndarray] = {}
    out[f"{prefix}query_embed.weight"] = np.asarray(tree["query_embed"])
    out[f"{prefix}query_feat.weight"] = np.asarray(tree["query_feat"])
    out[f"{prefix}level_embed.weight"] = np.asarray(tree["level_embed"])
    for j, seq in enumerate((0, 2, 4)):
        _r_dense(out, f"{prefix}mask_embed.{seq}",
                 tree["mask_embed"][f"layers_{j}"])
    if "cls_embed" in tree:
        _r_dense(out, f"{prefix}cls_embed", tree["cls_embed"])
    _r_ln(out, f"{prefix}transformer_decoder.post_norm",
          tree["post_norm"])
    i = 0
    while f"decoder_layers_{i}" in tree:
        lyr = tree[f"decoder_layers_{i}"]
        src = f"{prefix}transformer_decoder.layers.{i}"
        _r_mha(out, f"{src}.attentions.0.attn", lyr["cross_attn"])
        _r_mha(out, f"{src}.attentions.1.attn", lyr["self_attn"])
        _r_ffn(out, f"{src}.ffns.0", lyr["ffn"])
        for n in range(3):
            _r_ln(out, f"{src}.norms.{n}", lyr[f"norm{n + 1}"])
        i += 1
    pd_tree = tree["pixel_decoder"]
    pd = f"{prefix}pixel_decoder."
    out[f"{pd}level_encoding.weight"] = \
        np.asarray(pd_tree["level_encoding"])
    _r_conv(out, f"{pd}mask_feature", pd_tree["mask_feature"])
    lat_lvls = sorted(int(k.split("_")[-1]) for k in pd_tree
                      if k.startswith("lateral_conv_"))
    num_fpn = len(lat_lvls)
    for lvl in lat_lvls:
        k = num_fpn - 1 - lvl
        _r_conv(out, f"{pd}lateral_convs.{k}.conv",
                pd_tree[f"lateral_conv_{lvl}"])
        _r_ln(out, f"{pd}lateral_convs.{k}.gn",
              pd_tree[f"lateral_gn_{lvl}"]["GroupNorm_0"])
        _r_conv(out, f"{pd}output_convs.{k}.conv",
                pd_tree[f"output_conv_{lvl}"])
        _r_ln(out, f"{pd}output_convs.{k}.gn",
              pd_tree[f"output_gn_{lvl}"]["GroupNorm_0"])
    i = 0
    while f"input_conv_{i}" in pd_tree:
        _r_conv(out, f"{pd}input_convs.{i}.conv",
                pd_tree[f"input_conv_{i}"])
        _r_ln(out, f"{pd}input_convs.{i}.gn",
              pd_tree[f"input_gn_{i}"]["GroupNorm_0"])
        i += 1
    return out


def reverse_resnet(params: dict, batch_stats: dict,
                   prefix: str = "backbone.") -> dict:
    out: Dict[str, np.ndarray] = {}

    def bn(path_tree, stats_tree, key):
        _r_ln(out, key, path_tree["bn"])
        out[f"{key}.running_mean"] = np.asarray(stats_tree["bn"]["mean"])
        out[f"{key}.running_var"] = np.asarray(stats_tree["bn"]["var"])

    _r_conv(out, f"{prefix}conv1", params["conv1"])
    bn(params["bn1"], batch_stats["bn1"], f"{prefix}bn1")
    s = 1
    while f"layer{s}_block0" in params:
        b = 0
        while f"layer{s}_block{b}" in params:
            bp = params[f"layer{s}_block{b}"]
            bs = batch_stats[f"layer{s}_block{b}"]
            for i in (1, 2, 3):
                _r_conv(out, f"{prefix}layer{s}.{b}.conv{i}",
                        bp[f"conv{i}"])
                bn(bp[f"bn{i}"], bs[f"bn{i}"],
                   f"{prefix}layer{s}.{b}.bn{i}")
            if "downsample_conv" in bp:
                _r_conv(out, f"{prefix}layer{s}.{b}.downsample.0",
                        bp["downsample_conv"])
                bn(bp["downsample_bn"], bs["downsample_bn"],
                   f"{prefix}layer{s}.{b}.downsample.1")
            b += 1
        s += 1
    return out


def reverse_mtl_checkpoint(tree: dict, depths=(2, 2, 6, 2)) -> dict:
    """Our MTL param tree (params['params']) -> full mm-format flat state
    dict (reference multitask_learner key layout, Swin in mm format)."""
    out: Dict[str, np.ndarray] = {}
    if "backbone" in tree:
        for k, v in reverse_swin_mm(tree["backbone"],
                                    depths=depths).items():
            out[f"backbone.{k}"] = v
    if "neck" in tree:
        out.update(reverse_channel_mapper(tree["neck"]))
    if "shared_encoder" in tree:
        out.update(reverse_deformable_encoder(tree["shared_encoder"]))
    if "cls_head" in tree:
        out.update(reverse_cls_head(tree["cls_head"]))
    if "bbox_head" in tree:
        out.update(reverse_dino_head(tree["bbox_head"]))
    if "seg_head" in tree:
        out.update(reverse_mask2former_head(tree["seg_head"]))
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
