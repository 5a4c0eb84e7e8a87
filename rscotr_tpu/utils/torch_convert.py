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

from typing import Dict, Optional

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
