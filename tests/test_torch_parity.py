"""Numerical parity vs a from-scratch torch Swin (validates both the weight
converter's layout conventions and our block semantics against torch ops).

The torch model here is a minimal textbook Swin implementation written for
this test (not vendored); its state-dict uses the original Swin repo key
layout so ``convert_swin_original`` applies directly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rscotr_tpu.models.backbones.swin import (SwinTransformer,  # noqa: E402
                                              _rel_pos_index)
from rscotr_tpu.utils.torch_convert import (convert_swin_original,  # noqa
                                            t_lin)


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.register_buffer(
            "rel_idx", torch.from_numpy(_rel_pos_index(window)).long())

    def forward(self, x, mask=None):
        B_, n, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, n, 3, h, C // h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (C // h) ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.rel_idx.reshape(-1)].reshape(n, n, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, h, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, n, C)
        return self.proj(x)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        # x: (B, H, W, C) — NHWC to mirror our implementation
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        x = self.norm1(x)
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        shift = self.shift if min(H, W) > w else 0
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            from rscotr_tpu.models.backbones.swin import _shift_attn_mask
            mask = torch.from_numpy(
                _shift_attn_mask(Hp, Wp, w, shift)).float()
        else:
            mask = None
        xw = x.view(B, Hp // w, w, Wp // w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        xw = self.attn(xw, mask)
        x = xw.view(B, Hp // w, Wp // w, w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TorchTinySwin(tnn.Module):
    def __init__(self, dim=16, depth=2, heads=2, window=4):
        super().__init__()
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(3, dim, 4, 4)
        self.patch_embed.norm = tnn.LayerNorm(dim)
        self.layers = tnn.ModuleList()
        stage = tnn.Module()
        stage.blocks = tnn.ModuleList(
            [TorchSwinBlock(dim, heads, window,
                            0 if i % 2 == 0 else window // 2)
             for i in range(depth)])
        self.layers.append(stage)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):
        # x: (B, H, W, 3)
        x = self.patch_embed.proj(x.permute(0, 3, 1, 2))
        x = x.permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for blk in self.layers[0].blocks:
            x = blk(x)
        return self.norm(x)


def state_dict_numpy(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


class TestSwinParity:
    def test_tiny_swin_matches_torch(self):
        torch.manual_seed(0)
        tm = TorchTinySwin().eval()
        x_np = np.random.default_rng(0).normal(
            size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x_np)).numpy()

        jm = SwinTransformer(embed_dims=16, depths=(2,), num_heads=(2,),
                             window_size=4, drop_path_rate=0.0,
                             out_indices=(0,))
        params = jm.init(jax.random.key(0), jnp.asarray(x_np))
        state = state_dict_numpy(tm)
        # drop buffers the converter doesn't consume
        state = {k: v for k, v in state.items() if "rel_idx" not in k}
        converted = convert_swin_original(state, depths=(2,))
        # default matmul precision is bf16-class (TPU-style); parity checks
        # pin f32 to compare against torch
        with jax.default_matmul_precision("highest"):
            got = jm.apply({"params": converted}, jnp.asarray(x_np))[0]
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_linear_conversion_convention(self):
        tl = tnn.Linear(3, 5)
        w = t_lin(tl.weight.detach().numpy())
        x = np.ones((1, 3), np.float32)
        want = tl(torch.from_numpy(x)).detach().numpy()
        got = x @ w + tl.bias.detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)
