"""Optimizer tests: paramwise multipliers, LR schedule, task masking,
torch-AdamW parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu.engine.optimizer import (MtlOptimizer, build_optimizer,
                                         make_lr_schedule,
                                         paramwise_multipliers,
                                         task_param_masks)


def simple_params():
    return {
        "backbone": {"w": jnp.ones((4, 4))},
        "neck": {"w": jnp.ones((4,))},
        "shared_encoder": {"w": jnp.ones((2, 2))},
        "cls_head": {"w": jnp.ones((3,))},
        "bbox_head": {"query_embed": jnp.ones((5, 2)),
                      "w": jnp.ones((2,))},
        "seg_head": {"query_feat": jnp.ones((5, 2)),
                     "w": jnp.ones((2,))},
    }


class TestParamwise:
    def test_multipliers(self):
        p = simple_params()
        lr_t, dc_t = paramwise_multipliers(p, {
            "backbone": dict(lr_mult=0.1),
            "query_embed": dict(decay_mult=0.0),
            "query_feat": dict(decay_mult=0.0)})
        assert lr_t["backbone"]["w"] == 0.1
        assert lr_t["cls_head"]["w"] == 1.0
        assert dc_t["bbox_head"]["query_embed"] == 0.0
        assert dc_t["bbox_head"]["w"] == 1.0
        assert dc_t["seg_head"]["query_feat"] == 0.0


class TestSchedule:
    def test_step_policy(self):
        s = make_lr_schedule(dict(policy="step", step=[100, 200]), 1e-3)
        np.testing.assert_allclose(float(s(0)), 1e-3)
        np.testing.assert_allclose(float(s(150)), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(float(s(250)), 1e-5, rtol=1e-5)

    def test_linear_warmup(self):
        s = make_lr_schedule(dict(policy="step", step=[1000],
                                  warmup="linear", warmup_iters=10,
                                  warmup_ratio=0.1), 1.0)
        np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
        assert 0.5 < float(s(5)) < 0.6
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)

    def test_cosine_annealing(self):
        # mmcv CosineAnnealingLrUpdaterHook math:
        # end + 0.5*(start-end)*(1+cos(pi*t)), target = base*min_lr_ratio
        # (the reference cls schedule, configs/_base_/cls/resisc_adamw_swin
        # .py:21-24)
        base, ratio, T = 1e-3, 1e-2, 1000
        s = make_lr_schedule(dict(policy="CosineAnnealing",
                                  min_lr_ratio=ratio, max_iters=T), base)
        tgt = base * ratio
        for it in (0, 250, 500, 999, 1000):
            want = tgt + 0.5 * (base - tgt) * (1 + np.cos(np.pi * it / T))
            np.testing.assert_allclose(float(s(it)), want, rtol=1e-5)
        # explicit min_lr takes precedence over min_lr_ratio
        s2 = make_lr_schedule(dict(policy="CosineAnnealing", min_lr=1e-6,
                                   max_iters=T), base)
        np.testing.assert_allclose(float(s2(T)), 1e-6, rtol=1e-5)

    def test_warmup_scales_regular_lr(self):
        # mmcv get_warmup_lr multiplies the REGULAR schedule lr at that
        # iter, not base_lr: cosine + warmup must track the decayed lr
        s = make_lr_schedule(dict(policy="CosineAnnealing", min_lr=0.0,
                                  max_iters=100, warmup="linear",
                                  warmup_iters=10, warmup_ratio=0.5), 1.0)
        reg5 = 0.5 * (1 + np.cos(np.pi * 5 / 100))
        w5 = 1.0 - (1.0 - 5 / 10) * (1.0 - 0.5)
        np.testing.assert_allclose(float(s(5)), reg5 * w5, rtol=1e-5)

    def test_unknown_policy_raises(self):
        import pytest
        with pytest.raises(ValueError, match="not supported"):
            make_lr_schedule(dict(policy="cyclic"), 1e-3)


class TestTaskMasks:
    def test_masks(self):
        p = simple_params()
        masks = task_param_masks(p, cls_uses_encoder=False)
        assert float(masks["cls"]["backbone"]["w"]) == 1.0
        assert float(masks["cls"]["seg_head"]["w"]) == 0.0
        assert float(masks["cls"]["shared_encoder"]["w"]) == 0.0
        assert float(masks["det"]["shared_encoder"]["w"]) == 1.0
        assert float(masks["det"]["bbox_head"]["w"]) == 1.0
        assert float(masks["seg"]["bbox_head"]["w"]) == 0.0
        masks2 = task_param_masks(p, cls_uses_encoder=True)
        assert float(masks2["cls"]["shared_encoder"]["w"]) == 1.0


class TestAdamW:
    def test_matches_torch_adamw(self):
        """Our per-leaf AdamW == torch.optim.AdamW on a toy problem."""
        torch = pytest.importorskip("torch")
        lr, wd = 1e-2, 1e-2
        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        g = np.array([0.1, -0.2, 0.3], np.float32)

        tp = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
        for _ in range(5):
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()

        opt = MtlOptimizer(lr_schedule=lambda s: lr, weight_decay=wd,
                           grad_clip_norm=None)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        for _ in range(5):
            params, state, _ = opt.update({"w": jnp.asarray(g)}, state,
                                          params)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=1e-5)

    def test_mask_freezes_state_and_params(self):
        opt = MtlOptimizer(lr_schedule=lambda s: 1e-2, weight_decay=0.0,
                           grad_clip_norm=None)
        params = {"a": jnp.ones(3), "b": jnp.ones(3)}
        state = opt.init(params)
        mask = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.0)}
        g = {"a": jnp.ones(3), "b": jnp.ones(3)}
        p1, s1, _ = opt.update(g, state, params, mask)
        assert not np.allclose(np.asarray(p1["a"]), 1.0)
        np.testing.assert_allclose(np.asarray(p1["b"]), 1.0)  # frozen
        assert int(s1["count"]["a"]) == 1
        assert int(s1["count"]["b"]) == 0
        np.testing.assert_allclose(np.asarray(s1["mu"]["b"]), 0.0)

    def test_grad_clip(self):
        opt = MtlOptimizer(lr_schedule=lambda s: 1.0, weight_decay=0.0,
                           grad_clip_norm=0.1)
        params = {"a": jnp.zeros(4)}
        state = opt.init(params)
        g = {"a": jnp.full(4, 100.0)}
        p1, s1, gnorm = opt.update(g, state, params)
        assert float(gnorm) == pytest.approx(200.0)
        # post-clip step magnitude bounded by lr (adam normalizes), params
        # must stay finite and small
        assert np.isfinite(np.asarray(p1["a"])).all()

    def test_build_from_config(self):
        p = simple_params()
        opt = build_optimizer(
            dict(type="AdamW", lr=5e-5, weight_decay=1e-4,
                 paramwise_cfg=dict(custom_keys={
                     "backbone": dict(lr_mult=0.1)})),
            p, lr_config=dict(policy="step", step=[10]),
            grad_clip=dict(max_norm=0.1))
        assert opt.grad_clip_norm == 0.1
        assert opt.lr_mult_tree["backbone"]["w"] == 0.1
        s = opt.init(p)
        p2, s2, _ = opt.update(jax.tree.map(jnp.ones_like, p), s, p)
        assert int(s2["step"]) == 1


class TestMomentumSchedule:
    def test_matches_torch_with_per_step_betas(self):
        """mmcv MomentumUpdaterHook rewrites betas[0] per iter; parity vs
        torch.optim.AdamW driven the same way."""
        torch = pytest.importorskip("torch")
        from rscotr_tpu.engine.optimizer import make_momentum_schedule
        lr, wd = 1e-2, 1e-2
        mom = dict(policy="step", step=[2, 4], gamma=0.5)
        sched = make_momentum_schedule(mom, 0.9)
        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        g = np.array([0.1, -0.2, 0.3], np.float32)

        tp = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
        for it in range(6):
            b1 = float(sched(it))
            topt.param_groups[0]["betas"] = (b1, 0.999)
            topt.zero_grad()
            tp.grad = torch.tensor(g)
            topt.step()

        opt = MtlOptimizer(lr_schedule=lambda s: lr, weight_decay=wd,
                           grad_clip_norm=None, b1_schedule=sched)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        for _ in range(6):
            params, state, _ = opt.update({"w": jnp.asarray(g)}, state,
                                          params)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=1e-5)

    def test_momentum_key_mapping(self):
        from rscotr_tpu.engine.optimizer import make_momentum_schedule
        s = make_momentum_schedule(
            dict(policy="CosineAnnealing", min_momentum_ratio=0.5,
                 max_iters=100), 0.9)
        np.testing.assert_allclose(float(s(0)), 0.9, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 0.45, rtol=1e-6)
        assert make_momentum_schedule(None, 0.9) is None

    def test_build_optimizer_wires_momentum(self):
        opt = build_optimizer(
            dict(type="AdamW", lr=1e-3, betas=(0.8, 0.999)),
            {"w": jnp.ones(2)},
            momentum_config=dict(policy="step", step=[10], gamma=0.1))
        assert opt.b1_schedule is not None
        np.testing.assert_allclose(float(opt.b1_schedule(0)), 0.8)
        np.testing.assert_allclose(float(opt.b1_schedule(20)), 0.08,
                                   rtol=1e-6)


class TestGradAccumulation:
    """mmcv GradientCumulativeOptimizerHook: grads averaged over K iters,
    optimizer stepped on every K-th (torch-parity tested)."""

    def test_matches_torch_stepping_every_k(self):
        torch = pytest.importorskip("torch")
        lr, wd, K = 1e-2, 1e-2, 3
        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        rng = np.random.default_rng(0)
        gs = [rng.normal(size=3).astype(np.float32) for _ in range(9)]

        tp = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
        for i in range(0, 9, K):
            topt.zero_grad()
            tp.grad = torch.tensor(np.mean(gs[i:i + K], axis=0))
            topt.step()

        opt = MtlOptimizer(lr_schedule=lambda s: lr, weight_decay=wd,
                           grad_clip_norm=None, cumulative_iters=K)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        for i, g in enumerate(gs):
            prev = np.asarray(params["w"]).copy()
            params, state, _ = opt.update({"w": jnp.asarray(g)}, state,
                                          params)
            if (i + 1) % K != 0:  # non-apply iters leave params untouched
                np.testing.assert_array_equal(np.asarray(params["w"]),
                                              prev)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=1e-5)
        assert int(state["count"]["w"]) == 3     # 3 optimizer steps
        np.testing.assert_allclose(np.asarray(state["accum"]["w"]), 0.0)

    def test_mask_union_over_window(self):
        """A leaf touched by ANY iter of the window updates at apply; a
        leaf touched by NONE stays frozen (moments+count too)."""
        opt = MtlOptimizer(lr_schedule=lambda s: 1e-2, weight_decay=0.0,
                           grad_clip_norm=None, cumulative_iters=2)
        params = {"a": jnp.ones(2), "b": jnp.ones(2)}
        state = opt.init(params)
        g = {"a": jnp.ones(2), "b": jnp.ones(2)}
        m1 = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.0)}
        m0 = {"a": jnp.asarray(0.0), "b": jnp.asarray(0.0)}
        params, state, _ = opt.update(g, state, params, m1)  # touches a
        params, state, _ = opt.update(g, state, params, m0)  # touches none
        assert not np.allclose(np.asarray(params["a"]), 1.0)  # union -> a
        np.testing.assert_allclose(np.asarray(params["b"]), 1.0)
        assert int(state["count"]["a"]) == 1
        assert int(state["count"]["b"]) == 0

    def test_state_shape_default_unchanged(self):
        opt = MtlOptimizer(lr_schedule=lambda s: 1e-2)
        state = opt.init({"w": jnp.ones(2)})
        assert "accum" not in state
        opt2 = build_optimizer(dict(type="AdamW", lr=1e-3),
                               {"w": jnp.ones(2)}, cumulative_iters=4)
        assert "accum" in opt2.init({"w": jnp.ones(2)})

    def test_composes_with_jit_and_scan(self):
        """The accumulation state must trace cleanly under jit + lax.scan
        (the K-step scan-dispatch runner path carries opt_state)."""
        import jax as _jax
        opt = MtlOptimizer(lr_schedule=lambda s: 1e-2, weight_decay=0.0,
                           grad_clip_norm=None, cumulative_iters=2)
        params = {"w": jnp.ones(3)}
        state = opt.init(params)
        gs = jnp.stack([jnp.full(3, float(i + 1)) for i in range(4)])

        @_jax.jit
        def run(params, state, gs):
            def body(carry, g):
                p, s = carry
                p, s, gn = opt.update({"w": g}, s, p)
                return (p, s), gn
            (p, s), gns = _jax.lax.scan(body, (params, state), gs)
            return p, s, gns

        p_scan, s_scan, _ = run(params, state, gs)
        p_ref, s_ref = params, state
        for i in range(4):
            p_ref, s_ref, _ = opt.update({"w": gs[i]}, s_ref, p_ref)
        np.testing.assert_allclose(np.asarray(p_scan["w"]),
                                   np.asarray(p_ref["w"]), rtol=1e-6)
        assert int(s_scan["count"]["w"]) == 2
