"""Math-level unit tests for the ops layer (SURVEY.md §7.2 test pyramid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu import ops


class TestBoxOps:
    def test_cxcywh_roundtrip(self):
        rng = np.random.default_rng(0)
        xyxy = rng.uniform(0, 1, (10, 4)).astype(np.float32)
        xyxy[:, 2:] = xyxy[:, :2] + np.abs(xyxy[:, 2:])
        back = ops.bbox_cxcywh_to_xyxy(ops.bbox_xyxy_to_cxcywh(xyxy))
        np.testing.assert_allclose(back, xyxy, atol=1e-6)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.0, 0.5, 1.0, 0.001, 0.999])
        y = ops.inverse_sigmoid(x, eps=1e-3)
        np.testing.assert_allclose(jax.nn.sigmoid(y)[1], 0.5, atol=1e-6)
        assert np.isfinite(np.asarray(y)).all()

    def test_giou_matches_iou_for_overlapping(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        b = jnp.array([[0.0, 0.0, 2.0, 2.0], [1.0, 1.0, 3.0, 3.0],
                       [4.0, 4.0, 5.0, 5.0]])
        giou = np.asarray(ops.bbox_overlaps(a, b, mode="giou"))[0]
        iou = np.asarray(ops.bbox_overlaps(a, b, mode="iou"))[0]
        np.testing.assert_allclose(giou[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(iou[1], 1.0 / 7.0, atol=1e-5)
        assert giou[2] < 0  # disjoint boxes: giou negative


class TestMsDeformAttn:
    def _rand_inputs(self, seed=0, B=2, heads=4, dim=8, levels=2,
                     Q=5, P=3, shapes=((6, 8), (3, 4))):
        rng = np.random.default_rng(seed)
        nv = sum(h * w for h, w in shapes)
        value = rng.normal(size=(B, nv, heads, dim)).astype(np.float32)
        loc = rng.uniform(-0.2, 1.2,
                          (B, Q, heads, levels, P, 2)).astype(np.float32)
        attn = rng.uniform(0, 1, (B, Q, heads, levels, P)).astype(np.float32)
        attn = attn / attn.sum(axis=(-1, -2), keepdims=True)
        return value, shapes, loc, attn

    def test_vs_numpy_oracle(self):
        value, shapes, loc, attn = self._rand_inputs()
        out = ops.ms_deform_attn(value, shapes, loc, attn, impl="xla")
        ref = ops.ms_deform_attn.__module__  # noqa
        from rscotr_tpu.ops.ms_deform_attn import \
            ms_deform_attn_reference_numpy
        expected = ms_deform_attn_reference_numpy(value, shapes, loc, attn)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)

    def test_grads_exact_under_remat(self):
        """jax.checkpoint around the op must reproduce d_value/d_loc/d_aw
        BITWISE (the custom VJPs re-run identically in the rematerialized
        backward) — the encoder's with_cp knob rests on this."""
        value, shapes, loc, attn = self._rand_inputs(seed=5)
        value, loc, attn = (jnp.asarray(v) for v in (value, loc, attn))

        def f(value, loc, attn):
            return jnp.sum(
                ops.ms_deform_attn(value, shapes, loc, attn,
                                   impl="xla") ** 2)

        g0 = jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)
        g1 = jax.grad(jax.checkpoint(f), argnums=(0, 1, 2))(value, loc,
                                                            attn)
        for a, b in zip(g0, g1):
            assert (np.asarray(a) == np.asarray(b)).all()

    def test_vs_torch_grid_sample(self):
        """Cross-check against F.grid_sample, the semantics the CUDA op uses."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        value, shapes, loc, attn = self._rand_inputs(seed=3)
        B, nv, heads, dim = value.shape
        _, Q, _, levels, P, _ = loc.shape
        out = np.asarray(ops.ms_deform_attn(value, shapes, loc, attn,
                                            impl="xla"))

        # torch reference (mirrors mmcv's python fallback math)
        v = torch.from_numpy(value)
        sl = torch.from_numpy(loc)
        aw = torch.from_numpy(attn)
        split = [h * w for h, w in shapes]
        v_list = v.split(split, dim=1)
        grids = 2 * sl - 1
        outs = []
        for lvl, (H, W) in enumerate(shapes):
            v_l = v_list[lvl].flatten(2).transpose(1, 2).reshape(
                B * heads, dim, H, W)
            g_l = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
            sampled = F.grid_sample(v_l, g_l, mode="bilinear",
                                    padding_mode="zeros", align_corners=False)
            outs.append(sampled)  # (B*heads, dim, 1, Q*P)? check below
        # reshape attention: (B, Q, heads, levels, P) -> (B*heads, 1, Q, lv*P)
        aw_t = aw.transpose(1, 2).reshape(B * heads, Q, levels * P)
        sampled = torch.stack(
            [o.view(B * heads, dim, Q, P) for o in outs], dim=-2)
        sampled = sampled.flatten(-2)  # (B*heads, dim, Q, levels*P)
        res = (sampled * aw_t[:, None]).sum(-1)
        res = res.view(B, heads, dim, Q).permute(0, 3, 1, 2).reshape(
            B, Q, heads * dim)
        np.testing.assert_allclose(out, res.numpy(), atol=1e-4)

    def test_grad_finite(self):
        value, shapes, loc, attn = self._rand_inputs(seed=1)

        def f(v, l, a):
            return jnp.sum(ops.ms_deform_attn(v, shapes, l, a, impl="xla"))

        gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
        for g in (gv, gl, ga):
            assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(gv).sum()) > 0

    def test_grad_pallas_scatter_mm_matches_xla(self):
        """The MXU one-hot-matmul backward (value cotangent via
        ops/pallas/scatter_mm.py, interpret mode) must match the XLA
        scatter-add backward for every input's gradient."""
        value, shapes, loc, attn = self._rand_inputs(seed=2)

        def make(bwd_impl):
            def f(v, l, a):
                out = ops.ms_deform_attn(v, shapes, l, a, impl="xla",
                                         bwd_impl=bwd_impl)
                return jnp.sum(out * jnp.cos(out))
            return jax.grad(f, argnums=(0, 1, 2))

        args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
        g_xla = make("xla")(*args)
        g_mm = make("pallas_mm_interpret")(*args)
        for a, b in zip(g_xla, g_mm):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
        assert float(jnp.abs(g_xla[0]).sum()) > 0

    def test_grad_vs_torch_autograd(self):
        """The hand-written VJP (fused gather + corner-weighted-sum +
        per-level scatter) must match torch autograd through the
        F.grid_sample formulation for value/location/weight gradients."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        value, shapes, loc, attn = self._rand_inputs(seed=5)
        B, nv, heads, dim = value.shape
        _, Q, _, levels, P, _ = loc.shape

        def f(v, l, a):
            out = ops.ms_deform_attn(v, shapes, l, a, impl="xla")
            return jnp.sum(out * jnp.sin(out))

        g_jax = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

        v = torch.from_numpy(value).requires_grad_(True)
        sl = torch.from_numpy(loc).requires_grad_(True)
        aw = torch.from_numpy(attn).requires_grad_(True)
        split = [h * w for h, w in shapes]
        v_list = v.split(split, dim=1)
        grids = 2 * sl - 1
        outs = []
        for lvl, (H, W) in enumerate(shapes):
            v_l = v_list[lvl].flatten(2).transpose(1, 2).reshape(
                B * heads, dim, H, W)
            g_l = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
            outs.append(F.grid_sample(v_l, g_l, mode="bilinear",
                                      padding_mode="zeros",
                                      align_corners=False))
        aw_t = aw.transpose(1, 2).reshape(B * heads, Q, levels * P)
        sampled = torch.stack(
            [o.view(B * heads, dim, Q, P) for o in outs], dim=-2).flatten(-2)
        res = (sampled * aw_t[:, None]).sum(-1)
        res = res.view(B, heads, dim, Q).permute(0, 3, 1, 2).reshape(
            B, Q, heads * dim)
        (res * torch.sin(res)).sum().backward()

        for got, want in zip(g_jax, (v.grad, sl.grad, aw.grad)):
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       atol=2e-4, rtol=2e-4)


class TestHungarian:
    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.parametrize("shape", [(5, 5), (7, 20), (1, 10), (30, 60)])
    def test_vs_scipy(self, seed, shape):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(seed)
        cost = rng.normal(size=shape).astype(np.float32)
        col4row = np.asarray(ops.hungarian(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        # compare objective value (assignments may differ on ties)
        ours = cost[np.arange(shape[0]), col4row].sum()
        assert len(set(col4row.tolist())) == shape[0]  # valid assignment
        np.testing.assert_allclose(ours, cost[rows, cols].sum(), atol=1e-4)

    def test_padded_rows_stable(self):
        """Constant-cost pad rows must not change real-row assignments."""
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(42)
        real = rng.normal(size=(4, 12)).astype(np.float32)
        pad = np.full((3, 12), 1e6, dtype=np.float32)
        cost = np.concatenate([real, pad], 0)
        col4row = np.asarray(ops.hungarian(jnp.asarray(cost)))[:4]
        r, c = linear_sum_assignment(real)
        ours = real[np.arange(4), col4row].sum()
        np.testing.assert_allclose(ours, real[r, c].sum(), atol=1e-4)

    def test_batched(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(7)
        costs = rng.normal(size=(3, 6, 15)).astype(np.float32)
        outs = np.asarray(ops.hungarian_batched(jnp.asarray(costs)))
        for b in range(3):
            r, c = linear_sum_assignment(costs[b])
            np.testing.assert_allclose(
                costs[b][np.arange(6), outs[b]].sum(),
                costs[b][r, c].sum(), atol=1e-4)

    @pytest.mark.parametrize("seed", range(4))
    def test_row_valid_skips_pad_rows(self, seed):
        """Masked solve == scipy on the valid sub-problem; pad rows -> -1."""
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(100 + seed)
        nr, nc = 10, 25
        n_valid = int(rng.integers(0, nr + 1))
        cost = rng.normal(size=(nr, nc)).astype(np.float32)
        # pad rows get a constant cost, like dino_loss's PAD_COST rows
        cost[n_valid:] = 1e6
        valid = np.arange(nr) < n_valid
        col4row = np.asarray(
            ops.hungarian(jnp.asarray(cost), jnp.asarray(valid)))
        assert (col4row[n_valid:] == -1).all()
        if n_valid:
            r, c = linear_sum_assignment(cost[:n_valid])
            assigned = col4row[:n_valid]
            assert len(set(assigned.tolist())) == n_valid
            np.testing.assert_allclose(
                cost[np.arange(n_valid), assigned].sum(),
                cost[r, c].sum(), atol=1e-4)

    def test_row_valid_interleaved(self):
        """Validity mask need not be a prefix."""
        from scipy.optimize import linear_sum_assignment
        rng = np.random.default_rng(3)
        cost = rng.normal(size=(8, 16)).astype(np.float32)
        valid = np.array([1, 0, 1, 1, 0, 0, 1, 0], bool)
        col4row = np.asarray(
            ops.hungarian(jnp.asarray(cost), jnp.asarray(valid)))
        assert (col4row[~valid] == -1).all()
        sub = cost[valid]
        r, c = linear_sum_assignment(sub)
        assigned = col4row[valid]
        assert len(set(assigned.tolist())) == int(valid.sum())
        np.testing.assert_allclose(
            cost[valid][np.arange(valid.sum()), assigned].sum(),
            sub[r, c].sum(), atol=1e-4)


class TestLosses:
    def test_focal_loss_closed_form(self):
        # single sample, single class, background label
        logits = jnp.array([[0.0]])
        # label == C (=1) -> background
        loss = ops.sigmoid_focal_loss(logits, jnp.array([1]), avg_factor=1.0)
        # p=0.5, target=0: weight=(1-0.25)*0.5^2, bce=log(2)
        expected = 0.75 * 0.25 * np.log(2.0)
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_focal_loss_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        N, C = 16, 20
        logits = rng.normal(size=(N, C)).astype(np.float32)
        labels = rng.integers(0, C + 1, size=(N,))
        ours = float(ops.sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), avg_factor=N))
        # torch reference of the same math
        t_logits = torch.from_numpy(logits)
        target = torch.zeros(N, C)
        for i, l in enumerate(labels):
            if l < C:
                target[i, l] = 1.0
        p = t_logits.sigmoid()
        pt = (1 - p) * target + p * (1 - target)
        fw = (0.25 * target + 0.75 * (1 - target)) * pt.pow(2)
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            t_logits, target, reduction="none")
        expected = (bce * fw).sum() / N
        np.testing.assert_allclose(ours, float(expected), rtol=1e-5)

    def test_ce_ignore_index(self):
        logits = jnp.zeros((4, 3))
        labels = jnp.array([0, 1, 255, 5])  # 255 ignored; 5 out of range
        loss = ops.softmax_cross_entropy(logits, labels, ignore_index=255)
        np.testing.assert_allclose(float(loss), np.log(3.0), rtol=1e-4)

    def test_label_smooth(self):
        logits = jnp.array([[10.0, -10.0]])
        loss_hard = ops.label_smooth_loss(logits, jnp.array([0]),
                                          label_smooth_val=0.0)
        loss_smooth = ops.label_smooth_loss(logits, jnp.array([0]),
                                            label_smooth_val=0.1)
        assert float(loss_smooth) > float(loss_hard)

    def test_l1_giou(self):
        pred = jnp.array([[0.0, 0.0, 1.0, 1.0]])
        tgt = jnp.array([[0.0, 0.0, 1.0, 1.0]])
        assert float(ops.l1_loss(pred, tgt, avg_factor=1.0)) == 0.0
        np.testing.assert_allclose(
            float(ops.giou_loss(pred, tgt, avg_factor=1.0)), 0.0, atol=1e-6)

    def test_accuracy(self):
        logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
        labels = jnp.array([0, 1, 1])
        np.testing.assert_allclose(
            float(ops.accuracy(logits, labels)), 200.0 / 3, rtol=1e-5)


class TestPosEncoding:
    def test_sine_pos_enc_vs_mmcv_math(self):
        """Check against a direct transliteration of mmcv's formula."""
        torch = pytest.importorskip("torch")
        import math
        B, H, W, nf, temp = 2, 5, 7, 8, 20
        mask_np = np.zeros((B, H, W), dtype=bool)
        mask_np[1, 3:, :] = True  # padding region
        out = np.asarray(ops.sine_positional_encoding(
            jnp.asarray(mask_np), num_feats=nf, temperature=temp,
            normalize=True))

        mask = torch.from_numpy(mask_np)
        not_mask = (~mask).float()
        y = not_mask.cumsum(1)
        x = not_mask.cumsum(2)
        scale, eps = 2 * math.pi, 1e-6
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
        dim_t = torch.arange(nf).float()
        dim_t = temp ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / nf)
        px = x[..., None] / dim_t
        py = y[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                         dim=4).view(B, H, W, -1)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                         dim=4).view(B, H, W, -1)
        expected = torch.cat((py, px), dim=3).numpy()
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_coordinate_sine_embedding_vs_reference_math(self):
        torch = pytest.importorskip("torch")
        import math
        rng = np.random.default_rng(0)
        pos_np = rng.uniform(0, 1, (2, 6, 4)).astype(np.float32)
        out = np.asarray(ops.coordinate_sine_embedding(jnp.asarray(pos_np)))

        pos_tensor = torch.from_numpy(pos_np)
        scale = 2 * math.pi
        dim_t = torch.arange(128).float()
        dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / 128)

        def emb(coord):
            e = coord * scale
            p = e[:, :, None] / dim_t
            return torch.stack((p[:, :, 0::2].sin(), p[:, :, 1::2].cos()),
                               dim=3).flatten(2)

        expected = torch.cat([emb(pos_tensor[..., 1]), emb(pos_tensor[..., 0]),
                              emb(pos_tensor[..., 2]), emb(pos_tensor[..., 3])],
                             dim=2).numpy()
        np.testing.assert_allclose(out, expected, atol=5e-5)


class TestPointGenerator:
    def test_grid_points(self):
        pts = np.asarray(ops.single_level_grid_points(2, 3, stride=4))
        assert pts.shape == (6, 2)
        np.testing.assert_allclose(pts[0], [2.0, 2.0])   # (0.5*4, 0.5*4)
        np.testing.assert_allclose(pts[1], [6.0, 2.0])   # x-major
        np.testing.assert_allclose(pts[3], [2.0, 6.0])

    def test_encoder_reference_points_shape(self):
        shapes = ((4, 4), (2, 2))
        vr = jnp.ones((2, 2, 2))
        ref = ops.encoder_reference_points(shapes, vr)
        assert ref.shape == (2, 20, 2, 2)
        assert float(ref.min()) > 0 and float(ref.max()) < 1.01
