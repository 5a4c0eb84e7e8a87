"""Optimizer: paramwise AdamW + per-task update masking + LR schedule.

Capability-equivalent of the reference's ``MTLOptimizerConstructor``
(/root/reference/mtl/utils/optimizer.py:25-55) applying mmcv paramwise
``custom_keys`` (backbone lr_mult 0.1; query_embed/query_feat/level_embed
decay_mult 0 — configs/multi/MTL_slvlcls_...py:202-213), the mmcv
``OptimizerHook(grad_clip=0.1)`` and the step LR policy.

TPU-first redesign with exact torch semantics where they matter:
* custom AdamW with PER-LEAF integer step counts and a per-step task mask —
  replicates torch's behavior under DDP find_unused_parameters, where params
  not touched by the current task's graph receive NO moment update, NO
  weight decay, and NO bias-correction step advance
  (reference mtl/apis/train.py:38-46 + torch optimizer.step() semantics).
* global-norm grad clip over the task's gradients (untouched grads are
  exactly zero so they do not contribute, matching mmcv clip_grads).
* paramwise matching: longest-key-first substring match on the '/'-joined
  param path (mmcv SORT + first-match behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------

def make_lr_schedule(lr_config: Optional[dict], base_lr: float) -> Callable:
    """mmcv lr_config -> step->lr function. Policies: 'step', 'poly',
    'CosineAnnealing', 'exp', 'fixed' (mmcv LrUpdaterHook semantics,
    by_epoch=False — the only mode the reference configs use), plus
    linear/constant warmup. Warmup scales the REGULAR schedule lr at that
    iter (mmcv `get_warmup_lr`), not the base lr. Unknown policies raise
    instead of silently running fixed-lr."""
    lr_config = dict(lr_config or {})
    policy = lr_config.get("policy", "fixed")
    known = ("fixed", "step", "poly", "CosineAnnealing", "exp")
    if policy not in known:
        raise ValueError(
            f"lr_config policy {policy!r} not supported (have {known})")
    warmup = lr_config.get("warmup")
    warmup_iters = lr_config.get("warmup_iters", 0)
    warmup_ratio = lr_config.get("warmup_ratio", 0.1)

    def base(step):
        if policy == "step":
            steps = lr_config.get("step", [])
            gamma = lr_config.get("gamma", 0.1)
            k = jnp.sum(jnp.asarray(
                [step >= s for s in steps], jnp.float32))
            return base_lr * gamma ** k
        if policy == "poly":
            power = lr_config.get("power", 1.0)
            min_lr = lr_config.get("min_lr", 0.0)
            max_iters = lr_config.get("max_iters", 1)
            frac = jnp.clip(step / max_iters, 0.0, 1.0)
            return (base_lr - min_lr) * (1 - frac) ** power + min_lr
        if policy == "CosineAnnealing":
            # mmcv CosineAnnealingLrUpdaterHook: anneal from base_lr to
            # min_lr (or base_lr*min_lr_ratio) with
            # end + 0.5*(start-end)*(1+cos(pi*t)) over max_iters
            if lr_config.get("min_lr") is not None:
                target = float(lr_config["min_lr"])
            else:
                target = base_lr * float(lr_config.get("min_lr_ratio", 0.0))
            max_iters = lr_config.get("max_iters", 1)
            frac = jnp.clip(step / max_iters, 0.0, 1.0)
            return target + 0.5 * (base_lr - target) * (
                1.0 + jnp.cos(jnp.pi * frac))
        if policy == "exp":
            gamma = lr_config.get("gamma", 1.0)
            return base_lr * gamma ** step
        return jnp.asarray(base_lr)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = base(step)
        if warmup == "linear" and warmup_iters > 0:
            w = 1.0 - (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
            lr = jnp.where(step < warmup_iters, lr * w, lr)
        elif warmup == "constant" and warmup_iters > 0:
            lr = jnp.where(step < warmup_iters, lr * warmup_ratio, lr)
        return lr

    return sched


# ---------------------------------------------------------------------------
# Paramwise multipliers
# ---------------------------------------------------------------------------

def paramwise_multipliers(params, custom_keys: Dict[str, dict]):
    """Per-leaf (lr_mult, decay_mult) trees from mmcv-style custom_keys."""
    keys = sorted(custom_keys.keys(), key=len, reverse=True)

    def mults(path):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        for k in keys:
            if k in name:
                ck = custom_keys[k]
                return (float(ck.get("lr_mult", 1.0)),
                        float(ck.get("decay_mult", 1.0)))
        return (1.0, 1.0)

    lr_tree = jax.tree_util.tree_map_with_path(
        lambda p, v: mults(p)[0], params)
    decay_tree = jax.tree_util.tree_map_with_path(
        lambda p, v: mults(p)[1], params)
    return lr_tree, decay_tree


def no_decay_for_norms_and_biases(params, decay_tree):
    """torch AdamW decays everything by default (the reference does NOT
    exempt norms/biases beyond custom_keys) — provided as an opt-in knob."""
    def f(path, v, d):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("/bias") or "norm" in name.lower() or v.ndim <= 1:
            return 0.0
        return d
    return jax.tree_util.tree_map_with_path(f, params, decay_tree)


# ---------------------------------------------------------------------------
# Task masks
# ---------------------------------------------------------------------------

def task_param_masks(params, cls_uses_encoder: bool = False):
    """Per-task per-leaf float masks over the MTL param tree.

    Task -> touched top-level modules (reference graph reachability):
      cls: backbone + cls_head (+ neck & shared_encoder for MlvlClsHead)
      det: backbone + neck + shared_encoder + bbox_head
      seg: backbone + neck + shared_encoder + seg_head
    """
    shared = {"backbone", "neck", "shared_encoder"}
    touch = {
        "cls": ({"backbone", "cls_head"} | (shared if cls_uses_encoder
                                            else set())),
        "det": shared | {"bbox_head"},
        "seg": shared | {"seg_head"},
    }

    def mask_for(task):
        def f(path, v):
            top = str(getattr(path[0], "key", path[0]))
            return jnp.asarray(
                1.0 if top in touch[task] else 0.0, jnp.float32)
        return jax.tree_util.tree_map_with_path(f, params)

    return {t: mask_for(t) for t in ("cls", "det", "seg")}


# ---------------------------------------------------------------------------
# AdamW with per-leaf step counts and task masking
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MtlOptimizer:
    lr_schedule: Callable
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 1e-4
    grad_clip_norm: Optional[float] = 0.1
    lr_mult_tree: Any = None
    decay_mult_tree: Any = None
    # mmcv momentum_config: step -> beta1. Matches mmcv MomentumUpdaterHook
    # on Adam-family optimizers (it rewrites betas[0] each iter, so the
    # CURRENT beta1 enters both the EMA and torch's bias correction).
    b1_schedule: Optional[Callable] = None
    # mmcv GradientCumulativeOptimizerHook: average grads over K iters,
    # step the optimizer on every K-th. TPU-first shape: an accumulator +
    # touched-mask pair carried in opt_state and a traced apply flag
    # folded into the existing per-leaf mask — no host control flow, the
    # jitted step stays one compiled graph. Moments/counts/bias correction
    # advance only on apply steps (== torch stepping every K); the `step`
    # counter (and so the LR/momentum schedules) advances every iter, as
    # mmcv's runner does.
    cumulative_iters: int = 1

    def init(self, params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        counts = jax.tree.map(
            lambda p: jnp.zeros((), jnp.int32), params)
        state = {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params),
                 "count": counts, "step": jnp.zeros((), jnp.int32)}
        if self.cumulative_iters > 1:
            state["accum"] = jax.tree.map(jnp.zeros_like, params)
            state["accum_mask"] = jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32), params)
        return state

    def update(self, grads, state, params, mask=None):
        """Returns (new_params, new_state, grad_norm)."""
        if mask is None:
            mask = jax.tree.map(lambda g: jnp.asarray(1.0), grads)

        K = self.cumulative_iters
        if K > 1:
            # running average of the last K grads; a param is "touched"
            # for this apply window if ANY contributing task touched it
            grads = jax.tree.map(lambda a, g: a + g / K,
                                 state["accum"], grads)
            mask = jax.tree.map(lambda am, m: jnp.maximum(am, m),
                                state["accum_mask"], mask)
            apply = (jnp.mod(state["step"] + 1, K) == 0).astype(jnp.float32)
            accum_next = jax.tree.map(lambda a: a * (1.0 - apply), grads)
            amask_next = jax.tree.map(lambda m: m * (1.0 - apply), mask)
            mask = jax.tree.map(lambda m: m * apply, mask)

        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
        if self.grad_clip_norm is not None:
            scale = jnp.minimum(1.0, self.grad_clip_norm /
                                jnp.maximum(gnorm, 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        lr = self.lr_schedule(state["step"])
        b1 = (self.b1_schedule(state["step"])
              if self.b1_schedule is not None else self.b1)
        lr_tree = self.lr_mult_tree or jax.tree.map(
            lambda p: 1.0, params)
        dc_tree = self.decay_mult_tree or jax.tree.map(
            lambda p: 1.0, params)

        def upd(g, m, v, c, p, msk, lm, dm):
            new_c = c + msk.astype(jnp.int32)
            new_m = jnp.where(msk > 0, b1 * m + (1 - b1) * g, m)
            new_v = jnp.where(msk > 0,
                              self.b2 * v + (1 - self.b2) * g * g, v)
            cf = jnp.maximum(new_c.astype(jnp.float32), 1.0)
            mhat = new_m / (1 - b1 ** cf)
            vhat = new_v / (1 - self.b2 ** cf)
            step = mhat / (jnp.sqrt(vhat) + self.eps) + \
                self.weight_decay * dm * p
            new_p = p - msk * lr * lm * step
            return new_p, new_m, new_v, new_c

        flat = jax.tree.map(upd, grads, state["mu"], state["nu"],
                            state["count"], params, mask, lr_tree, dc_tree)
        new_params = jax.tree.map(lambda t: t[0], flat,
                                  is_leaf=lambda t: isinstance(t, tuple))
        new_state = {
            "mu": jax.tree.map(lambda t: t[1], flat,
                               is_leaf=lambda t: isinstance(t, tuple)),
            "nu": jax.tree.map(lambda t: t[2], flat,
                               is_leaf=lambda t: isinstance(t, tuple)),
            "count": jax.tree.map(lambda t: t[3], flat,
                                  is_leaf=lambda t: isinstance(t, tuple)),
            "step": state["step"] + 1,
        }
        if K > 1:
            new_state["accum"] = accum_next
            new_state["accum_mask"] = amask_next
        return new_params, new_state, gnorm


def make_momentum_schedule(momentum_config: Optional[dict],
                           base_momentum: float) -> Optional[Callable]:
    """mmcv momentum_config -> step->beta1 function. Reuses the LR-policy
    math (mmcv's momentum updaters mirror its LR updaters), mapping the
    momentum-specific keys min_momentum/min_momentum_ratio onto
    min_lr/min_lr_ratio. Cyclic/OneCycle raise (SGD one-cycle recipes —
    nothing in the reference uses them)."""
    if not momentum_config:
        return None
    mc = dict(momentum_config)
    if "min_momentum" in mc:
        mc["min_lr"] = mc.pop("min_momentum")
    if "min_momentum_ratio" in mc:
        mc["min_lr_ratio"] = mc.pop("min_momentum_ratio")
    return make_lr_schedule(mc, base_momentum)


def build_optimizer(optimizer_cfg: dict, params,
                    lr_config: Optional[dict] = None,
                    grad_clip: Optional[dict] = None,
                    momentum_config: Optional[dict] = None,
                    cumulative_iters: int = 1) -> MtlOptimizer:
    """Build from reference-shaped configs (optimizer/lr_config/
    optimizer_config.{grad_clip,cumulative_iters}/momentum_config)."""
    cfg = dict(optimizer_cfg)
    assert cfg.get("type", "AdamW") == "AdamW", cfg.get("type")
    base_lr = cfg.get("lr", 5e-5)
    paramwise = cfg.get("paramwise_cfg") or {}
    custom_keys = paramwise.get("custom_keys") or {}
    lr_tree, dc_tree = (None, None)
    if custom_keys:
        lr_tree, dc_tree = paramwise_multipliers(params, custom_keys)
    clip = None
    if grad_clip:
        clip = float(grad_clip.get("max_norm", 0.1))
    b1 = cfg.get("betas", (0.9, 0.999))[0]
    return MtlOptimizer(
        lr_schedule=make_lr_schedule(lr_config, base_lr),
        b1=b1,
        b2=cfg.get("betas", (0.9, 0.999))[1],
        eps=cfg.get("eps", 1e-8),
        weight_decay=cfg.get("weight_decay", 1e-4),
        grad_clip_norm=clip,
        lr_mult_tree=lr_tree,
        decay_mult_tree=dc_tree,
        b1_schedule=make_momentum_schedule(momentum_config, b1),
        cumulative_iters=int(cumulative_iters))
