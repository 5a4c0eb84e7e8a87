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
