"""JAX -> mm reverse checkpoint conversion (VERDICT r2 next #6).

Round-trips torch -> JAX -> torch and asserts BIT-EQUAL state dicts, so
rebuilt/trained checkpoints are consumable by the reference stack
(reference key naming: multitask_learner.py:308-353). Forward converters
are parity-tested against live torch modules elsewhere
(tests/test_convert_full.py, test_composed_parity.py); these tests prove
the reverse functions are exact inverses on full key coverage.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.utils import torch_convert as tc  # noqa: E402


def _assert_state_dicts_equal(got: dict, want: dict):
    assert set(got) == set(want), (
        sorted(set(want) - set(got)), sorted(set(got) - set(want)))
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k)


class TestOracleMtlRoundTrip:
    """The composed-parity torch MTL oracle covers Swin blocks, neck,
    deformable encoder, cls/DINO/Mask2Former heads in mm layout."""

    @pytest.fixture(scope="class")
    def sd(self):
        import test_composed_parity as T
        tmtl = T.build_torch_mtl()
        return {k: v.detach().numpy().copy()
                for k, v in tmtl.state_dict().items()
                if "rel_idx" not in k}

    def test_backbone(self, sd):
        sub = {k.removeprefix("backbone."): v for k, v in sd.items()
               if k.startswith("backbone.")}
        tree = tc.convert_swin_original(sub, depths=(2,))
        back = tc.reverse_swin_original(tree, depths=(2,),
                                        out_norm_names={0: "norm"})
        _assert_state_dicts_equal(back, sub)

    def test_neck(self, sd):
        tree = tc.convert_channel_mapper(sd)
        back = tc.reverse_channel_mapper(tree)
        want = {k: v for k, v in sd.items() if k.startswith("neck.")}
        _assert_state_dicts_equal(back, want)

    def test_encoder(self, sd):
        tree = tc.convert_deformable_encoder(sd)
        back = tc.reverse_deformable_encoder(tree)
        want = {k: v for k, v in sd.items()
                if k.startswith("shared_encoder.")}
        _assert_state_dicts_equal(back, want)

    def test_cls_head(self, sd):
        tree = tc.convert_cls_head(sd)
        back = tc.reverse_cls_head(tree)
        want = {k: v for k, v in sd.items() if k.startswith("cls_head.")}
        _assert_state_dicts_equal(back, want)

    def test_dino_head(self, sd):
        tree = tc.convert_dino_head(sd)
        back = tc.reverse_dino_head(tree)
        want = {k: v for k, v in sd.items() if k.startswith("bbox_head.")}
        _assert_state_dicts_equal(back, want)

    def test_mask2former_head(self, sd):
        tree = tc.convert_mask2former_head(sd)
        back = tc.reverse_mask2former_head(tree)
        want = {k: v for k, v in sd.items() if k.startswith("seg_head.")}
        _assert_state_dicts_equal(back, want)


def _rand_sd(shapes: dict, seed=0) -> dict:
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=s).astype(np.float32)
            for k, s in shapes.items()}


class TestSwinMmRoundTrip:
    """mm-format Swin with PatchMerging downsample: the unfold column
    permutation must invert exactly."""

    def test_two_stage_with_downsample(self):
        C = 8
        shapes = {"patch_embed.proj.weight": (C, 3, 4, 4),
                  "patch_embed.proj.bias": (C,),
                  "patch_embed.norm.weight": (C,),
                  "patch_embed.norm.bias": (C,)}
        for s, dim in ((0, C), (1, 2 * C)):
            b = f"stages.{s}.blocks.0"
            shapes.update({
                f"{b}.norm1.weight": (dim,), f"{b}.norm1.bias": (dim,),
                f"{b}.attn.w_msa.qkv.weight": (3 * dim, dim),
                f"{b}.attn.w_msa.qkv.bias": (3 * dim,),
                f"{b}.attn.w_msa.relative_position_bias_table": (169, 2),
                f"{b}.attn.w_msa.proj.weight": (dim, dim),
                f"{b}.attn.w_msa.proj.bias": (dim,),
                f"{b}.norm2.weight": (dim,), f"{b}.norm2.bias": (dim,),
                f"{b}.ffn.layers.0.0.weight": (4 * dim, dim),
                f"{b}.ffn.layers.0.0.bias": (4 * dim,),
                f"{b}.ffn.layers.1.weight": (dim, 4 * dim),
                f"{b}.ffn.layers.1.bias": (dim,),
            })
            shapes[f"norm{s}.weight"] = (dim,)
            shapes[f"norm{s}.bias"] = (dim,)
        shapes.update({
            "stages.0.downsample.norm.weight": (4 * C,),
            "stages.0.downsample.norm.bias": (4 * C,),
            "stages.0.downsample.reduction.weight": (2 * C, 4 * C),
        })
        sd = _rand_sd(shapes)
        tree = tc.convert_swin_mm(dict(sd), depths=(1, 1))
        back = tc.reverse_swin_mm(tree, depths=(1, 1))
        _assert_state_dicts_equal(back, sd)


class TestResNetRoundTrip:
    def test_block_with_downsample(self):
        shapes = {"backbone.conv1.weight": (8, 3, 7, 7),
                  "backbone.bn1.weight": (8,), "backbone.bn1.bias": (8,),
                  "backbone.bn1.running_mean": (8,),
                  "backbone.bn1.running_var": (8,)}
        for i, (ci, co) in enumerate(((8, 4), (4, 4), (4, 16)), 1):
            shapes[f"backbone.layer1.0.conv{i}.weight"] = \
                (co, ci, 3 if i == 2 else 1, 3 if i == 2 else 1)
            for nm in ("weight", "bias", "running_mean", "running_var"):
                shapes[f"backbone.layer1.0.bn{i}.{nm}"] = (co,)
        shapes["backbone.layer1.0.downsample.0.weight"] = (16, 8, 1, 1)
        for nm in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"backbone.layer1.0.downsample.1.{nm}"] = (16,)
        sd = _rand_sd(shapes)
        params, stats = tc.convert_resnet(dict(sd))
        back = tc.reverse_resnet(params, stats)
        _assert_state_dicts_equal(back, sd)


class TestPixelDecoderFpnRoundTrip:
    """Mask2Former pixel decoder with lateral/output/input convs (the
    descending-level index remap must invert)."""

    def test_fpn_convs(self):
        C = 8
        shapes = {"seg_head.query_embed.weight": (4, C),
                  "seg_head.query_feat.weight": (4, C),
                  "seg_head.level_embed.weight": (2, C),
                  "seg_head.transformer_decoder.post_norm.weight": (C,),
                  "seg_head.transformer_decoder.post_norm.bias": (C,),
                  "seg_head.pixel_decoder.level_encoding.weight": (2, C),
                  "seg_head.pixel_decoder.mask_feature.weight":
                      (C, C, 1, 1),
                  "seg_head.pixel_decoder.mask_feature.bias": (C,)}
        for j, seq in enumerate((0, 2, 4)):
            shapes[f"seg_head.mask_embed.{seq}.weight"] = (C, C)
            shapes[f"seg_head.mask_embed.{seq}.bias"] = (C,)
        for k in range(2):
            for grp in ("lateral_convs", "output_convs", "input_convs"):
                kk = 3 if grp == "lateral_convs" else 3
                shapes[f"seg_head.pixel_decoder.{grp}.{k}.conv.weight"] = \
                    (C, C, 1, 1) if grp != "output_convs" else (C, C, 3, 3)
                if grp == "input_convs":
                    shapes[
                        f"seg_head.pixel_decoder.{grp}.{k}.conv.bias"] = \
                        (C,)
                shapes[f"seg_head.pixel_decoder.{grp}.{k}.gn.weight"] = \
                    (C,)
                shapes[f"seg_head.pixel_decoder.{grp}.{k}.gn.bias"] = (C,)
        sd = _rand_sd(shapes)
        tree = tc.convert_mask2former_head(dict(sd))
        back = tc.reverse_mask2former_head(tree)
        _assert_state_dicts_equal(back, sd)


class TestFullCheckpointRoundTrip:
    def test_reverse_mtl_checkpoint_prefixes(self):
        """reverse_mtl_checkpoint emits every component under its
        reference prefix (smoke over the oracle tree)."""
        import test_composed_parity as T
        tmtl = T.build_torch_mtl()
        sd = {k: v.detach().numpy().copy()
              for k, v in tmtl.state_dict().items() if "rel_idx" not in k}
        tree = {
            "neck": tc.convert_channel_mapper(sd),
            "shared_encoder": tc.convert_deformable_encoder(sd),
            "cls_head": tc.convert_cls_head(sd),
            "bbox_head": tc.convert_dino_head(sd),
            "seg_head": tc.convert_mask2former_head(sd),
        }
        flat = tc.reverse_mtl_checkpoint(tree)
        for prefix in ("neck.", "shared_encoder.", "cls_head.",
                       "bbox_head.", "seg_head."):
            assert any(k.startswith(prefix) for k in flat), prefix
        want = {k: v for k, v in sd.items()
                if not k.startswith("backbone.")}
        _assert_state_dicts_equal(flat, want)
