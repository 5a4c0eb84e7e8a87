"""Full mm-format converter parity (VERDICT r1 #5 / BASELINE.md protocol).

From-scratch torch modules (written for this test, mmcv-style state-dict
key layout) are converted with utils/torch_convert and compared numerically
against our flax modules: shared deformable encoder layer (torch oracle
uses F.grid_sample — the same math as mmcv's CUDA ms_deform_attn), DETR
MultiheadAttention, ChannelMapper, Mask2Former decoder layer. Full DINO /
Mask2Former head conversions are checked structurally: every leaf of the
flax head tree must be produced with the right shape.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rscotr_tpu.utils import torch_convert as tc  # noqa: E402


def sd_np(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ---------------------------------------------------------------------------
# torch oracles (mmcv-compatible state-dict layout)
# ---------------------------------------------------------------------------

def torch_msda_core(value, spatial_shapes, loc, w):
    """mmcv multi_scale_deformable_attn_pytorch semantics
    (grid_sample, align_corners=False)."""
    B, _, H, D = value.shape
    Q, L, P = loc.shape[1], loc.shape[3], loc.shape[4]
    samples = []
    start = 0
    for lvl, (h, wd) in enumerate(spatial_shapes):
        v = value[:, start:start + h * wd].permute(0, 2, 3, 1) \
            .reshape(B * H, D, h, wd)
        grid = loc[:, :, :, lvl].permute(0, 2, 1, 3, 4) \
            .reshape(B * H, Q, P, 2) * 2 - 1
        s = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)          # (B*H, D, Q, P)
        samples.append(s)
        start += h * wd
    samp = torch.stack(samples, dim=-2)                 # (B*H, D, Q, L, P)
    ww = w.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L, P)
    out = (samp * ww).sum((-1, -2))                     # (B*H, D, Q)
    return out.reshape(B, H, D, Q).permute(0, 3, 1, 2).reshape(B, Q, H * D)


class TorchMSDeformAttn(tnn.Module):
    def __init__(self, C, H, L, P):
        super().__init__()
        self.C, self.H, self.L, self.P = C, H, L, P
        self.sampling_offsets = tnn.Linear(C, H * L * P * 2)
        self.attention_weights = tnn.Linear(C, H * L * P)
        self.value_proj = tnn.Linear(C, C)
        self.output_proj = tnn.Linear(C, C)

    def forward(self, query, value, query_pos, ref, shapes):
        B, Q, C = query.shape
        H, L, P = self.H, self.L, self.P
        q = query + query_pos
        Nv = value.shape[1]
        v = self.value_proj(value).view(B, Nv, H, C // H)
        off = self.sampling_offsets(q).view(B, Q, H, L, P, 2)
        aw = self.attention_weights(q).view(B, Q, H, L * P)
        aw = aw.softmax(-1).view(B, Q, H, L, P)
        normalizer = torch.tensor([[wd, h] for h, wd in shapes],
                                  dtype=torch.float32)
        loc = ref[:, :, None, :, None, :] + \
            off / normalizer[None, None, None, :, None, :]
        out = torch_msda_core(v, shapes, loc, aw)
        return query + self.output_proj(out)


class TorchFFN(tnn.Module):
    def __init__(self, C, Fh):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, Fh), tnn.ReLU()),
            tnn.Linear(Fh, C))

    def forward(self, x):
        return x + self.layers(x)


class TorchEncLayer(tnn.Module):
    def __init__(self, C, H, L, P, Fh):
        super().__init__()
        self.attentions = tnn.ModuleList([TorchMSDeformAttn(C, H, L, P)])
        self.ffns = tnn.ModuleList([TorchFFN(C, Fh)])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C), tnn.LayerNorm(C)])

    def forward(self, x, pos, ref, shapes):
        x = self.attentions[0](x, x, pos, ref, shapes)
        x = self.norms[0](x)
        x = self.ffns[0](x)
        return self.norms[1](x)


class TorchEncoder(tnn.Module):
    def __init__(self, n, C, H, L, P, Fh):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TorchEncLayer(C, H, L, P, Fh) for _ in range(n)])

    def forward(self, x, pos, ref, shapes):
        for layer in self.layers:
            x = layer(x, pos, ref, shapes)
        return x


class TestEncoderParity:
    def test_deformable_encoder_matches_torch(self):
        torch.manual_seed(0)
        C, H, L, P, Fh, NL = 32, 2, 2, 4, 64, 2
        shapes = ((6, 8), (3, 4))
        Nv = sum(h * w for h, w in shapes)
        tm = TorchEncoder(NL, C, H, L, P, Fh).eval()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, Nv, C)).astype(np.float32)
        pos = rng.normal(size=(2, Nv, C)).astype(np.float32)
        ref = rng.uniform(0.1, 0.9, size=(2, Nv, L, 2)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(pos),
                      torch.from_numpy(ref), shapes).numpy()

        from rscotr_tpu.models.layers.transformer import DeformableEncoder
        jm = DeformableEncoder(num_layers=NL, embed_dims=C, num_heads=H,
                               num_levels=L, num_points=P,
                               feedforward_channels=Fh)
        converted = tc.convert_deformable_encoder(sd_np(tm), prefix="")
        with jax.default_matmul_precision("highest"):
            got = jm.apply({"params": converted}, jnp.asarray(x),
                           jnp.asarray(pos), jnp.asarray(ref), shapes)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=2e-4)


class TorchDetrMHA(tnn.Module):
    """mmcv MultiheadAttention layout: wraps torch MHA as .attn."""

    def __init__(self, C, H):
        super().__init__()
        self.attn = tnn.MultiheadAttention(C, H, batch_first=True)

    def forward(self, q, k, v, q_pos, k_pos, attn_mask=None):
        out, _ = self.attn(q + q_pos if q_pos is not None else q,
                           k + k_pos if k_pos is not None else k,
                           v, attn_mask=attn_mask)
        return q + out


class TestMhaParity:
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_mha_conversion(self, with_mask):
        torch.manual_seed(1)
        C, H, Nq, Nk = 32, 4, 10, 14
        tm = TorchDetrMHA(C, H).eval()
        rng = np.random.default_rng(1)
        q = rng.normal(size=(2, Nq, C)).astype(np.float32)
        k = rng.normal(size=(2, Nk, C)).astype(np.float32)
        qp = rng.normal(size=(2, Nq, C)).astype(np.float32)
        kp = rng.normal(size=(2, Nk, C)).astype(np.float32)
        mask = rng.uniform(size=(Nq, Nk)) < 0.3 if with_mask else None
        # keep at least one allowed key per row
        if mask is not None:
            mask[:, 0] = False
        tmask = torch.from_numpy(mask) if mask is not None else None
        with torch.no_grad():
            want = tm(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(k), torch.from_numpy(qp),
                      torch.from_numpy(kp), tmask).numpy()

        from rscotr_tpu.models.layers.attention import MultiheadAttention
        jm = MultiheadAttention(embed_dims=C, num_heads=H)
        p: dict = {}
        tc._mha(p, (), sd_np(tm), "attn")
        with jax.default_matmul_precision("highest"):
            got = jm.apply(
                {"params": p}, jnp.asarray(q), key=jnp.asarray(k),
                value=jnp.asarray(k), query_pos=jnp.asarray(qp),
                key_pos=jnp.asarray(kp),
                attn_mask=jnp.asarray(mask) if mask is not None else None)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=2e-5)


class TorchChannelMapper(tnn.Module):
    def __init__(self, in_chs, out_ch, extra=1):
        super().__init__()
        def block(cin, k, s):
            m = tnn.Module()
            m.conv = tnn.Conv2d(cin, out_ch, k, s, k // 2, bias=False)
            m.gn = tnn.GroupNorm(8, out_ch)
            return m
        self.convs = tnn.ModuleList([block(c, 1, 1) for c in in_chs])
        self.extra_convs = tnn.ModuleList(
            [block(in_chs[-1] if j == 0 else out_ch, 3, 2)
             for j in range(extra)])

    def forward(self, feats):
        outs = [m.gn(m.conv(f)) for m, f in zip(self.convs, feats)]
        src = feats[-1]
        for m in self.extra_convs:
            src = m.gn(m.conv(src))
            outs.append(src)
        return outs


class TestChannelMapperParity:
    def test_neck_conversion(self):
        torch.manual_seed(2)
        in_chs, out_ch = (16, 32), 24
        tm = TorchChannelMapper(in_chs, out_ch).eval()
        rng = np.random.default_rng(2)
        f_np = [rng.normal(size=(2, c, 8 // (1 + i), 8 // (1 + i))
                           ).astype(np.float32)
                for i, c in enumerate(in_chs)]
        with torch.no_grad():
            want = [o.permute(0, 2, 3, 1).numpy()
                    for o in tm([torch.from_numpy(f) for f in f_np])]

        from rscotr_tpu.models.necks.channel_mapper import ChannelMapper
        jm = ChannelMapper(in_channels=in_chs, out_channels=out_ch,
                           kernel_size=1, num_outs=3, norm_groups=8)
        state = {f"neck.{k}": v for k, v in sd_np(tm).items()}
        converted = tc.convert_channel_mapper(state)
        feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in f_np)
        with jax.default_matmul_precision("highest"):
            got = jm.apply({"params": converted}, feats)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w,
                                       rtol=1e-4, atol=2e-5)


class TorchMaskedDecLayer(tnn.Module):
    """Mask2Former decoder layer, mmcv key layout: attentions.0 = cross,
    attentions.1 = self; norms 0..2; ffns.0."""

    def __init__(self, C, H, Fh):
        super().__init__()
        self.attentions = tnn.ModuleList(
            [TorchDetrMHA(C, H), TorchDetrMHA(C, H)])
        self.ffns = tnn.ModuleList([TorchFFN(C, Fh)])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])

    def forward(self, q, mem, q_pos, k_pos, cross_mask):
        q = self.attentions[0](q, mem, mem, q_pos, k_pos, cross_mask)
        q = self.norms[0](q)
        q = self.attentions[1](q, q, q, q_pos, q_pos)
        q = self.norms[1](q)
        q = self.ffns[0](q)
        return self.norms[2](q)


class TestMaskedDecoderLayerParity:
    def test_layer_conversion(self):
        torch.manual_seed(3)
        C, H, Fh, Q, Nk = 32, 4, 64, 6, 20
        tm = TorchMaskedDecLayer(C, H, Fh).eval()
        rng = np.random.default_rng(3)
        q = rng.normal(size=(2, Q, C)).astype(np.float32)
        mem = rng.normal(size=(2, Nk, C)).astype(np.float32)
        qp = rng.normal(size=(2, Q, C)).astype(np.float32)
        kp = rng.normal(size=(2, Nk, C)).astype(np.float32)
        cm = rng.uniform(size=(2 * H, Q, Nk)) < 0.3
        cm[:, :, 0] = False
        with torch.no_grad():
            want = tm(torch.from_numpy(q), torch.from_numpy(mem),
                      torch.from_numpy(qp), torch.from_numpy(kp),
                      torch.from_numpy(cm)).numpy()

        from rscotr_tpu.models.layers.transformer import \
            MaskedAttentionDecoderLayer
        jm = MaskedAttentionDecoderLayer(embed_dims=C, num_heads=H,
                                         feedforward_channels=Fh)
        # reuse the seg-head converter's per-layer mapping
        state = {f"seg_head.transformer_decoder.layers.0.{k}": v
                 for k, v in sd_np(tm).items()}
        state = {k.replace(".attentions.0.attn.", ".attentions.0.attn.")
                 : v for k, v in state.items()}
        p: dict = {}
        src = "transformer_decoder.layers.0"
        st = {k.removeprefix("seg_head."): v for k, v in state.items()}
        tc._mha(p, ("cross_attn",), st, f"{src}.attentions.0.attn")
        tc._mha(p, ("self_attn",), st, f"{src}.attentions.1.attn")
        tc._ffn(p, ("ffn",), st, f"{src}.ffns.0")
        for n in range(3):
            tc._ln(p, (f"norm{n + 1}",), st, f"{src}.norms.{n}")
        with jax.default_matmul_precision("highest"):
            got = jm.apply({"params": p}, jnp.asarray(q), jnp.asarray(mem),
                           jnp.asarray(qp), jnp.asarray(kp),
                           cross_attn_mask=jnp.asarray(cm))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# full-head structural conversion (every flax leaf covered, right shape)
# ---------------------------------------------------------------------------

def _rand_state(spec):
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=s).astype(np.float32)
            for k, s in spec.items()}


def _leaf_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


class TestFullHeadConversion:
    def test_dino_head_full_coverage(self):
        from rscotr_tpu.models.heads.dino_head import DINOHead
        C, H, L, P, Fh, NL, K, NQ = 32, 2, 2, 4, 64, 2, 5, 12
        head = DINOHead(num_classes=K, num_query=NQ, embed_dims=C,
                        num_decoder_layers=NL, num_feature_levels=L,
                        num_heads=H, num_points=P, feedforward_channels=Fh,
                        strides=(8, 16))

        def encode_fn(tokens, pos, ref, shapes, key_padding_mask=None,
                      deterministic=True):
            return tokens

        feats = (jnp.zeros((1, 8, 8, C)), jnp.zeros((1, 4, 4, C)))
        hw = jnp.asarray([[64, 64]], jnp.int32)
        params = head.init(jax.random.key(0), feats, hw, encode_fn)

        spec = {
            "label_embedding.weight": (K, C),
            "transformer.level_embeds": (L, C),
            "transformer.query_embed.weight": (NQ, C),
            "transformer.enc_output.weight": (C, C),
            "transformer.enc_output.bias": (C,),
            "transformer.enc_output_norm.weight": (C,),
            "transformer.enc_output_norm.bias": (C,),
            "transformer.decoder.norm.weight": (C,),
            "transformer.decoder.norm.bias": (C,),
        }
        for j in range(2):
            spec[f"transformer.decoder.ref_point_head.layers.{j}.weight"] \
                = (C, 2 * C if j == 0 else C)
            spec[f"transformer.decoder.ref_point_head.layers.{j}.bias"] \
                = (C,)
        for i in range(NL + 1):
            spec[f"cls_branches.{i}.weight"] = (K, C)
            spec[f"cls_branches.{i}.bias"] = (K,)
            for fc, (o, ih) in zip((0, 2, 4), ((C, C), (C, C), (4, C))):
                spec[f"reg_branches.{i}.{fc}.weight"] = (o, ih)
                spec[f"reg_branches.{i}.{fc}.bias"] = (o,)
        for i in range(NL):
            d = f"transformer.decoder.layers.{i}"
            spec[f"{d}.attentions.0.attn.in_proj_weight"] = (3 * C, C)
            spec[f"{d}.attentions.0.attn.in_proj_bias"] = (3 * C,)
            spec[f"{d}.attentions.0.attn.out_proj.weight"] = (C, C)
            spec[f"{d}.attentions.0.attn.out_proj.bias"] = (C,)
            for nm, (o, ih) in (("sampling_offsets", (H * L * P * 2, C)),
                                ("attention_weights", (H * L * P, C)),
                                ("value_proj", (C, C)),
                                ("output_proj", (C, C))):
                spec[f"{d}.attentions.1.{nm}.weight"] = (o, ih)
                spec[f"{d}.attentions.1.{nm}.bias"] = (o,)
            spec[f"{d}.ffns.0.layers.0.0.weight"] = (Fh, C)
            spec[f"{d}.ffns.0.layers.0.0.bias"] = (Fh,)
            spec[f"{d}.ffns.0.layers.1.weight"] = (C, Fh)
            spec[f"{d}.ffns.0.layers.1.bias"] = (C,)
            for n in range(3):
                spec[f"{d}.norms.{n}.weight"] = (C,)
                spec[f"{d}.norms.{n}.bias"] = (C,)

        state = {f"bbox_head.{k}": v for k, v in _rand_state(spec).items()}
        converted = tc.convert_dino_head(state)
        want = _leaf_paths(params["params"])
        got = _leaf_paths(converted)
        assert got == want   # identical paths AND shapes

    def test_mask2former_head_full_coverage(self):
        from rscotr_tpu.models.heads.mask2former_head import Mask2FormerHead
        C, H, Fh, NL, Q, L = 32, 4, 64, 3, 8, 2
        head = Mask2FormerHead(
            in_channels=(16, 24, 32, 48), feat_channels=C, out_channels=C,
            num_classes=5, num_queries=Q, num_transformer_feat_level=L,
            scheme=2, num_heads=H, num_decoder_layers=NL,
            feedforward_channels=Fh, pixel_decoder_strides=(4, 8))

        def encode_fn(tokens, pos, ref, shapes, key_padding_mask=None,
                      deterministic=True):
            return tokens

        neck = (jnp.zeros((1, 8, 8, C)), jnp.zeros((1, 4, 4, C)))
        bb = (jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 24)),
              jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 4, 4, 48)))
        params = head.init(jax.random.key(0), neck, bb, encode_fn)

        spec = {
            "query_embed.weight": (Q, C),
            "query_feat.weight": (Q, C),
            "level_embed.weight": (L, C),
            "transformer_decoder.post_norm.weight": (C,),
            "transformer_decoder.post_norm.bias": (C,),
            "pixel_decoder.level_encoding.weight": (L, C),
            "pixel_decoder.mask_feature.weight": (C, C, 1, 1),
            "pixel_decoder.mask_feature.bias": (C,),
        }
        for j, seq in enumerate((0, 2, 4)):
            spec[f"mask_embed.{seq}.weight"] = (C, C)
            spec[f"mask_embed.{seq}.bias"] = (C,)
        # num_fpn = 4 backbone levels - 2 encoder levels = 2 lateral/output
        # convs; reference appends them in descending input-level order
        for k2, lvl in enumerate((1, 0)):
            cin = (16, 24)[lvl]
            spec[f"pixel_decoder.lateral_convs.{k2}.conv.weight"] = \
                (C, cin, 1, 1)
            spec[f"pixel_decoder.lateral_convs.{k2}.gn.weight"] = (C,)
            spec[f"pixel_decoder.lateral_convs.{k2}.gn.bias"] = (C,)
            spec[f"pixel_decoder.output_convs.{k2}.conv.weight"] = \
                (C, C, 3, 3)
            spec[f"pixel_decoder.output_convs.{k2}.gn.weight"] = (C,)
            spec[f"pixel_decoder.output_convs.{k2}.gn.bias"] = (C,)
        for i in range(NL):
            d = f"transformer_decoder.layers.{i}"
            for a in (0, 1):
                spec[f"{d}.attentions.{a}.attn.in_proj_weight"] = (3 * C, C)
                spec[f"{d}.attentions.{a}.attn.in_proj_bias"] = (3 * C,)
                spec[f"{d}.attentions.{a}.attn.out_proj.weight"] = (C, C)
                spec[f"{d}.attentions.{a}.attn.out_proj.bias"] = (C,)
            spec[f"{d}.ffns.0.layers.0.0.weight"] = (Fh, C)
            spec[f"{d}.ffns.0.layers.0.0.bias"] = (Fh,)
            spec[f"{d}.ffns.0.layers.1.weight"] = (C, Fh)
            spec[f"{d}.ffns.0.layers.1.bias"] = (C,)
            for n in range(3):
                spec[f"{d}.norms.{n}.weight"] = (C,)
                spec[f"{d}.norms.{n}.bias"] = (C,)

        state = {f"seg_head.{k}": v for k, v in _rand_state(spec).items()}
        converted = tc.convert_mask2former_head(state)
        want = _leaf_paths(params["params"])
        got = _leaf_paths(converted)
        assert got == want


# ---------------------------------------------------------------------------
# ResNet backbone (torchvision/mm key layout) -> flax + batch_stats
# ---------------------------------------------------------------------------

class TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TorchMiniResNet(tnn.Module):
    """2-stage bottleneck ResNet, torchvision/mmcv state-dict key layout
    (conv1/bn1/layer{s}.{b}.../downsample.0|1)."""

    def __init__(self, blocks=(3, 4)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin, planes = 64, 64
        for s, nb in enumerate(blocks):
            stage = []
            for b in range(nb):
                stride = (1 if s == 0 else 2) if b == 0 else 1
                stage.append(TorchBottleneck(cin, planes, stride=stride,
                                             downsample=(b == 0)))
                cin = planes * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*stage))
            planes *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in (1, 2):
            x = getattr(self, f"layer{s}")(x)
            outs.append(x)
        return outs


def test_resnet_conversion_matches_torch():
    from rscotr_tpu.models.backbones.resnet import ResNet

    tm = TorchMiniResNet()
    tm.eval()
    # non-trivial running stats
    with torch.no_grad():
        for _ in range(2):
            tm(torch.randn(2, 3, 64, 64))
    tm.eval()

    state = {f"backbone.{k}": v for k, v in sd_np(tm).items()}
    p, stats = tc.convert_resnet(state)

    rn = ResNet(depth=50, num_stages=2, out_indices=(0, 1),
                norm_eval=True)
    x = np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    variables = {"params": p, "batch_stats": stats}
    with jax.default_matmul_precision("highest"):
        outs = rn.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        touts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, to in zip(outs, touts):
        np.testing.assert_allclose(
            np.asarray(o), to.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=1e-3)
