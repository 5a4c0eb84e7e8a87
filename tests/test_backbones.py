"""Backbone / neck / transformer-brick shape and sanity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rng():
    return jax.random.key(0)


class TestSwin:
    def test_shapes_224(self, rng):
        from rscotr_tpu.models.backbones import SwinTransformer
        m = SwinTransformer(drop_path_rate=0.0)
        x = jnp.zeros((1, 224, 224, 3))
        params = m.init(rng, x)
        outs = m.apply(params, x)
        assert len(outs) == 4
        shapes = [o.shape for o in outs]
        assert shapes == [(1, 56, 56, 96), (1, 28, 28, 192),
                          (1, 14, 14, 384), (1, 7, 7, 768)]

    def test_shapes_non_divisible(self, rng):
        """512-input: 128 is not a multiple of window 7 -> internal padding."""
        from rscotr_tpu.models.backbones import SwinTransformer
        m = SwinTransformer(depths=(2, 2), num_heads=(3, 6),
                            out_indices=(0, 1), drop_path_rate=0.0)
        x = jnp.zeros((1, 96, 96, 3))
        params = m.init(rng, x)
        outs = m.apply(params, x)
        assert outs[0].shape == (1, 24, 24, 96)
        assert outs[1].shape == (1, 12, 12, 192)

    def test_param_count_swin_t(self, rng):
        """Swin-T should be ~28M params (sanity vs the published model)."""
        from rscotr_tpu.models.backbones import SwinTransformer
        m = SwinTransformer()
        params = m.init(rng, jnp.zeros((1, 224, 224, 3)))
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(params["params"]))
        assert 27e6 < n < 29e6, f"got {n}"

    def test_shifted_window_changes_output(self, rng):
        """Shift must mix information across window boundaries."""
        from rscotr_tpu.models.backbones.swin import _shift_attn_mask
        m = _shift_attn_mask(14, 14, 7, 3)
        assert m.shape == (4, 49, 49)
        assert (m < 0).any() and (m == 0).any()

    def test_with_cp_remat_is_exact(self, rng):
        """with_cp (per-block jax.checkpoint remat) must not change the
        forward values or the gradients — it only trades recompute for
        residual memory (mmcv Swin's torch checkpointing knob)."""
        from rscotr_tpu.models.backbones import SwinTransformer
        kw = dict(depths=(2, 2), num_heads=(3, 6), out_indices=(0, 1),
                  drop_path_rate=0.0)
        m0 = SwinTransformer(**kw)
        m1 = SwinTransformer(with_cp=True, **kw)
        x = jax.random.normal(rng, (1, 56, 56, 3))
        params = m0.init(rng, x)

        def loss(m):
            return lambda p: sum(jnp.sum(o * o) for o in m.apply(p, x))

        with jax.default_matmul_precision("highest"):
            v0, g0 = jax.value_and_grad(loss(m0))(params)
            v1, g1 = jax.value_and_grad(loss(m1))(params)
        assert jnp.allclose(v0, v1)
        # tolerance scaled to the global grad magnitude: the two compiled
        # graphs reassociate f32 reductions differently, leaving ~1e-5
        # absolute noise that reads as a large RELATIVE error only on
        # near-zero leaves (cancellation); a remat logic bug would show
        # O(gmax) errors. (Raw-op exactness under jax.checkpoint is pinned
        # separately by the d_value/d_loc/d_aw probe in test history.)
        gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g0))
        assert jax.tree.all(jax.tree.map(
            lambda a, b: jnp.max(jnp.abs(a - b)) <= 1e-4 * (1.0 + gmax),
            g0, g1))


class TestResNet:
    def test_shapes(self, rng):
        from rscotr_tpu.models.backbones import ResNet
        m = ResNet(depth=50)
        x = jnp.zeros((1, 224, 224, 3))
        variables = m.init(rng, x)
        outs = m.apply(variables, x)
        assert [o.shape for o in outs] == [
            (1, 56, 56, 256), (1, 28, 28, 512),
            (1, 14, 14, 1024), (1, 7, 7, 2048)]


class TestChannelMapper:
    def test_four_outs(self, rng):
        from rscotr_tpu.models.necks import ChannelMapper
        m = ChannelMapper(in_channels=(192, 384, 768), num_outs=4)
        feats = tuple(jnp.zeros((2, s, s, c))
                      for s, c in [(28, 192), (14, 384), (7, 768)])
        params = m.init(rng, feats)
        outs = m.apply(params, feats)
        assert [o.shape for o in outs] == [
            (2, 28, 28, 256), (2, 14, 14, 256), (2, 7, 7, 256),
            (2, 4, 4, 256)]


class TestTransformerBricks:
    def test_deformable_encoder(self, rng):
        from rscotr_tpu.models.layers import DeformableEncoder
        from rscotr_tpu.ops import encoder_reference_points
        shapes = ((8, 8), (4, 4))
        nv = 64 + 16
        B, C = 2, 32
        enc = DeformableEncoder(num_layers=2, embed_dims=C, num_heads=4,
                                num_levels=2, num_points=2,
                                feedforward_channels=64)
        x = jax.random.normal(rng, (B, nv, C))
        pos = jnp.zeros((B, nv, C))
        vr = jnp.ones((B, 2, 2))
        ref = encoder_reference_points(shapes, vr)
        params = enc.init(rng, x, pos, ref, shapes)
        out = enc.apply(params, x, pos, ref, shapes)
        assert out.shape == (B, nv, C)
        assert np.isfinite(np.asarray(out)).all()

    def test_encoder_with_cp_remat_is_exact(self, rng):
        """Encoder-layer remat (with_cp) is value- and grad-exact; it only
        drops the per-layer MSDA residuals from the backward's memory."""
        from rscotr_tpu.models.layers import DeformableEncoder
        from rscotr_tpu.ops import encoder_reference_points
        shapes = ((8, 8), (4, 4))
        nv = 64 + 16
        B, C = 2, 32
        kw = dict(num_layers=2, embed_dims=C, num_heads=4, num_levels=2,
                  num_points=2, feedforward_channels=64)
        e0 = DeformableEncoder(**kw)
        e1 = DeformableEncoder(with_cp=True, **kw)
        x = jax.random.normal(rng, (B, nv, C))
        pos = jnp.zeros((B, nv, C))
        ref = encoder_reference_points(shapes, jnp.ones((B, 2, 2)))
        params = e0.init(rng, x, pos, ref, shapes)

        def loss(e):
            return lambda p, xx: jnp.sum(
                e.apply(p, xx, pos, ref, shapes) ** 2)

        with jax.default_matmul_precision("highest"):
            v0, g0 = jax.value_and_grad(loss(e0), argnums=(0, 1))(params, x)
            v1, g1 = jax.value_and_grad(loss(e1), argnums=(0, 1))(params, x)
        assert jnp.allclose(v0, v1)
        # global-magnitude tolerance: see the Swin remat test's comment
        gmax = max(float(jnp.max(jnp.abs(l))) for l in jax.tree.leaves(g0))
        assert jax.tree.all(jax.tree.map(
            lambda a, b: jnp.max(jnp.abs(a - b)) <= 1e-4 * (1.0 + gmax),
            g0, g1))

    def test_mha_attn_mask(self, rng):
        from rscotr_tpu.models.layers import MultiheadAttention
        B, N, C = 1, 6, 16
        mha = MultiheadAttention(embed_dims=C, num_heads=2)
        q = jax.random.normal(rng, (B, N, C))
        params = mha.init(rng, q)
        # block mask: first 3 queries cannot see last 3 keys and vice versa
        mask = np.zeros((N, N), bool)
        mask[:3, 3:] = True
        mask[3:, :3] = True
        out_masked = mha.apply(params, q, attn_mask=jnp.asarray(mask))
        out_full = mha.apply(params, q)
        assert not np.allclose(np.asarray(out_masked), np.asarray(out_full))

    def test_msda_init_offsets(self, rng):
        """Sampling-offset kernel starts zero; bias is the rotational grid."""
        from rscotr_tpu.models.layers import MultiScaleDeformableAttention
        shapes = ((4, 4),)
        m = MultiScaleDeformableAttention(embed_dims=16, num_heads=4,
                                          num_levels=1, num_points=2)
        q = jnp.zeros((1, 5, 16))
        v = jnp.zeros((1, 16, 16))
        ref = jnp.full((1, 5, 1, 2), 0.5)
        params = m.init(rng, q, v, reference_points=ref,
                        spatial_shapes=shapes)
        p = params["params"]
        assert float(jnp.abs(p["sampling_offsets"]["kernel"]).max()) == 0.0
        bias = np.asarray(p["sampling_offsets"]["bias"]).reshape(4, 1, 2, 2)
        # head 0 points along +x with magnitudes 1, 2
        np.testing.assert_allclose(bias[0, 0, 0], [1.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(bias[0, 0, 1], [2.0, 0.0], atol=1e-5)
