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


class TestMsDeformAttnPallas:
    """Pallas MSDA kernel vs the numpy oracle and the XLA path."""

    def _inputs(self, seed=0, B=2, H=4, D=16, P=4,
                shapes=((12, 16), (6, 8), (3, 4))):
        rng = np.random.default_rng(seed)
        L = len(shapes)
        Nv = sum(h * w for h, w in shapes)
        Q = 37
        value = rng.normal(size=(B, Nv, H, D)).astype(np.float32)
        # locations straddle the border to exercise validity masking
        loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)
                          ).astype(np.float32)
        aw = rng.uniform(size=(B, Q, H, L, P)).astype(np.float32)
        aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
        return value, shapes, loc, aw

    def test_matches_numpy_oracle(self):
        from rscotr_tpu.ops.ms_deform_attn import \
            ms_deform_attn_reference_numpy
        from rscotr_tpu.ops.pallas import ms_deform_attn_kernel as mk

        value, shapes, loc, aw = self._inputs()
        mk._INTERPRET[0] = True
        try:
            got = np.asarray(mk.ms_deform_attn_pallas(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw)))
        finally:
            mk._INTERPRET[0] = False
        want = ms_deform_attn_reference_numpy(value, shapes, loc, aw)
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_xla_path(self):
        from rscotr_tpu.ops.ms_deform_attn import _ms_deform_attn_xla
        from rscotr_tpu.ops.pallas import ms_deform_attn_kernel as mk

        value, shapes, loc, aw = self._inputs(seed=3)
        mk._INTERPRET[0] = True
        try:
            got = np.asarray(mk.ms_deform_attn_pallas(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(aw)))
        finally:
            mk._INTERPRET[0] = False
        want = np.asarray(_ms_deform_attn_xla(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_grads_match_xla(self):
        """custom_vjp backward == autodiff of the XLA formulation."""
        from rscotr_tpu.ops.ms_deform_attn import _ms_deform_attn_xla
        from rscotr_tpu.ops.pallas import ms_deform_attn_kernel as mk

        value, shapes, loc, aw = self._inputs(seed=7, B=1, H=2, D=8,
                                              shapes=((6, 8), (3, 4)))
        v, l, a = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)

        def f_pallas(v, l, a):
            return jnp.sum(mk.ms_deform_attn_pallas(v, shapes, l, a) ** 2)

        def f_xla(v, l, a):
            return jnp.sum(_ms_deform_attn_xla(v, shapes, l, a) ** 2)

        mk._INTERPRET[0] = True
        try:
            g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(v, l, a)
        finally:
            mk._INTERPRET[0] = False
        g2 = jax.grad(f_xla, argnums=(0, 1, 2))(v, l, a)
        for a_, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestScatterAddMM:
    """ops/pallas/scatter_mm.py — the MSDA backward's MXU scatter."""

    @pytest.mark.parametrize("gate_dma", [False, True])
    @pytest.mark.parametrize("shape", [
        (2, 300, 128, 37),      # rows not a multiple of the block
        (1, 100, 32, 9),        # narrow rows (C=32), tiny table
        (3, 1500, 128, 1024),   # K > k_block after padding
    ])
    def test_matches_xla_scatter(self, shape, gate_dma):
        from rscotr_tpu.ops.pallas.scatter_mm import (scatter_add_mm,
                                                      scatter_add_xla)
        G, K, C, R = shape
        rng = np.random.default_rng(G * K)
        upd = jnp.asarray(rng.normal(size=(G, K, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, size=(G, K)).astype(np.int32))
        ref = scatter_add_xla(upd, idx, R)
        out = scatter_add_mm(upd, idx, R, acc_dtype=jnp.float32,
                             interpret=True, gate_dma=gate_dma)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_duplicate_indices_accumulate(self):
        from rscotr_tpu.ops.pallas.scatter_mm import scatter_add_mm
        upd = jnp.ones((1, 64, 128), jnp.float32)
        idx = jnp.zeros((1, 64), jnp.int32)   # all 64 updates hit row 0
        out = scatter_add_mm(upd, idx, 8, acc_dtype=jnp.float32,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(out[0, 0]), 64.0)
        np.testing.assert_allclose(np.asarray(out[0, 1:]), 0.0)


class TestScatterAddMMSharded:
    """custom_partitioning: the kernel shards along G under SPMD jit."""

    def test_sharded_matches_local(self, cpu_mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rscotr_tpu.ops.pallas.scatter_mm import (scatter_add_mm,
                                                      scatter_add_xla)
        G, K, C, R = 16, 96, 32, 25
        rng = np.random.default_rng(5)
        upd = rng.normal(size=(G, K, C)).astype(np.float32)
        idx = rng.integers(0, R, size=(G, K)).astype(np.int32)
        sh = NamedSharding(cpu_mesh, P("data"))
        upd_d = jax.device_put(jnp.asarray(upd), sh)
        idx_d = jax.device_put(jnp.asarray(idx), sh)

        f = jax.jit(lambda u, i: scatter_add_mm(
            u, i, R, acc_dtype=jnp.float32, interpret=True))
        out = f(upd_d, idx_d)
        # stays sharded along G — no replication under SPMD
        assert out.sharding.spec[0] == "data", out.sharding
        ref = scatter_add_xla(jnp.asarray(upd), jnp.asarray(idx), R)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_msda_grad_sharded_matches_single_device(self, cpu_mesh):
        """Full MSDA backward through the pallas_mm path with the batch
        sharded over 8 devices == the unsharded XLA-scatter backward."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rscotr_tpu.ops.ms_deform_attn import _ms_deform_attn_xla

        rng = np.random.default_rng(11)
        B, H, D, Pn = 8, 2, 8, 4
        shapes = ((6, 8), (3, 4))
        L = len(shapes)
        Nv = sum(h * w for h, w in shapes)
        Q = 19
        value = rng.normal(size=(B, Nv, H, D)).astype(np.float32)
        loc = rng.uniform(-0.1, 1.1, size=(B, Q, H, L, Pn, 2)
                          ).astype(np.float32)
        aw = rng.uniform(size=(B, Q, H, L, Pn)).astype(np.float32)
        aw = aw / aw.sum(axis=(-2, -1), keepdims=True)

        def loss(v, l, a, bwd_impl):
            return jnp.sum(
                _ms_deform_attn_xla(v, shapes, l, a, bwd_impl) ** 2)

        want = jax.grad(lambda v: loss(v, jnp.asarray(loc), jnp.asarray(aw),
                                       "xla"))(jnp.asarray(value))

        sh = NamedSharding(cpu_mesh, P("data"))
        v_d = jax.device_put(jnp.asarray(value), sh)
        l_d = jax.device_put(jnp.asarray(loc), sh)
        a_d = jax.device_put(jnp.asarray(aw), sh)
        got = jax.jit(jax.grad(
            lambda v, l, a: loss(v, l, a, "pallas_mm_interpret")))(
                v_d, l_d, a_d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestMsdaWsKernels:
    """Interpret-mode parity for the PROBED-AND-REJECTED corner-weighted-
    sum kernels (ops/pallas/msda_ws.py — kept as measured evidence; the
    production path stays XLA, see the module docstring)."""

    @pytest.mark.parametrize("shape", [(3, 70, 16, 128), (2, 333, 8, 64)])
    def test_fwd_bwd_match_reference(self, shape):
        from rscotr_tpu.ops.pallas.msda_ws import ws_bwd, ws_fwd

        G, Q, KP, C4 = shape
        D = C4 // 4
        rng = np.random.default_rng(0)
        g = rng.normal(size=(G, Q, KP, C4)).astype(np.float32)
        wt = rng.normal(size=(G, Q, KP, 4)).astype(np.float32)
        do = rng.normal(size=(G, Q, D)).astype(np.float32)
        wt_cm = np.transpose(wt, (0, 1, 3, 2)).reshape(G, Q, 4 * KP)

        w128 = np.repeat(wt, D, axis=-1)
        tmp = (g * w128).sum(2)
        ref = sum(tmp[..., c * D:(c + 1) * D] for c in range(4))
        out = ws_fwd(jnp.asarray(g), jnp.asarray(wt_cm), interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=1e-5, atol=1e-5)

        dg, dwt = ws_bwd(jnp.asarray(g), jnp.asarray(wt_cm),
                         jnp.asarray(do), interpret=True)
        dg_ref = w128 * np.tile(do[:, :, None, :], (1, 1, KP, 4))
        dwt_ref = np.transpose(np.stack(
            [(g[..., c * D:(c + 1) * D] * do[:, :, None, :]).sum(-1)
             for c in range(4)], -1), (0, 1, 3, 2)).reshape(G, Q, 4 * KP)
        np.testing.assert_allclose(np.asarray(dg), dg_ref,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dwt), dwt_ref,
                                   rtol=1e-5, atol=1e-5)
