"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestWindowAttentionFused:
    def _ref(self, q, k, v, bias, mask, scale):
        B, nW, H, n, hd = q.shape
        s = np.einsum("bwhqd,bwhkd->bwhqk", q * scale, k)
        s = s + bias[None, None]
        if mask is not None:
            s = s + mask[None, :, None]
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        return np.einsum("bwhqk,bwhkd->bwhqd", p, v)

    @pytest.mark.parametrize("with_mask", [False, True])
    def test_matches_reference(self, with_mask):
        from rscotr_tpu.ops.pallas.window_attention import \
            window_attention_fused
        rng = np.random.default_rng(0)
        B, nW, H, n, hd = 2, 4, 3, 49, 32
        q = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        k = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        v = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        bias = rng.normal(size=(H, n, n)).astype(np.float32)
        mask = (rng.integers(0, 2, (nW, n, n)) * -100.0).astype(np.float32) \
            if with_mask else None
        scale = hd ** -0.5
        with jax.default_matmul_precision("highest"):
            got = window_attention_fused(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(bias),
                shift_mask=jnp.asarray(mask) if mask is not None else None,
                scale=scale, interpret=True)
        want = self._ref(q, k, v, bias, mask, scale)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_padding_inert(self):
        """Padded key columns must not leak probability mass."""
        from rscotr_tpu.ops.pallas.window_attention import \
            window_attention_fused
        rng = np.random.default_rng(1)
        B, nW, H, n, hd = 1, 1, 1, 5, 8   # n pads to 8, hd pads to 128
        q = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        k = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        v = rng.normal(size=(B, nW, H, n, hd)).astype(np.float32)
        bias = np.zeros((H, n, n), np.float32)
        with jax.default_matmul_precision("highest"):
            got = np.asarray(window_attention_fused(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(bias), scale=hd ** -0.5, interpret=True))
        want = self._ref(q, k, v, bias, None, hd ** -0.5)
        np.testing.assert_allclose(got, want, atol=2e-5)
