"""Jitted per-task train / val / inference steps.

Capability-equivalent of the reference's ``MTL.train_step``/``val_step``
(/root/reference/models/multi/multitask_learner.py:229-258): forward the
single-task batch, sum the loss dict, scale by ``task_weight[task]``,
namespace log vars ``{task}.{dataset_name}.{loss_name}``. The optimizer
update applies the per-task param mask (engine/optimizer.py).

TPU-first: three jitted step functions (one static graph per task —
SURVEY.md §7 'start with 3 fns'); batch stays on device; the cls
mixup/cutmix augments run on-device inside the step (reference runs them on
GPU too, multitask_learner.py:119-121).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from rscotr_tpu.models.heads.cdn import (CdnConfig, cdn_self_attn_mask,
                                         generate_cdn_queries)
from rscotr_tpu.models.heads.dino_loss import DetLossConfig, dino_loss
from rscotr_tpu.ops.box_ops import bbox_xyxy_to_cxcywh
from rscotr_tpu.ops.losses import label_smooth_loss, softmax_cross_entropy


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    task_weight: Dict[str, float]
    cls_num_classes: int = 45
    cls_label_smooth: float = 0.1
    cls_mixup_alpha: float = 0.8
    cls_cutmix_alpha: float = 1.0
    cls_use_augments: bool = True
    seg_ignore_index: int = 255
    seg_loss_weight: float = 1.0
    cdn: Optional[CdnConfig] = None
    det: Optional[DetLossConfig] = None
    # device-side preprocessing: (mean, std) in 0-255 range; applied inside
    # the jitted step whenever the batch image dtype is uint8
    img_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None
    # device-side cls augmentation (ops/device_augment): set when the cls
    # loader runs in cls_device_augment mode (batch carries aug_* records)
    device_aug: Optional[object] = None
    # device-side seg augmentation (loader.seg_device_augment)
    seg_device_aug: Optional[object] = None
    # device-side det augmentation (loader.det_device_augment)
    det_device_aug: Optional[object] = None


def device_normalize(img, img_norm, img_hw=None):
    """On-TPU normalize of uint8 images (+ re-zero the padded region so it
    matches the reference's pad-AFTER-normalize zeros). No-op for float
    inputs (already normalized host-side)."""
    if img.dtype != jnp.uint8:
        return img
    mean, std = img_norm if img_norm is not None else (
        (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
    x = (img.astype(jnp.float32) - jnp.asarray(mean)) / jnp.asarray(std)
    if img_hw is not None:
        B, H, W, _ = x.shape
        row = jnp.arange(H)[None, :] < img_hw[:, 0][:, None]   # (B, H)
        col = jnp.arange(W)[None, :] < img_hw[:, 1][:, None]   # (B, W)
        keep = (row[:, :, None] & col[:, None, :])[..., None]
        x = jnp.where(keep, x, 0.0)
    return x


# ---------------------------------------------------------------------------
# cls batch augments (mmcls BatchMixup/BatchCutMix, one chosen per batch)
# ---------------------------------------------------------------------------

def cls_batch_augment(rng, img, labels, num_classes, mixup_alpha=0.8,
                      cutmix_alpha=1.0):
    B, H, W, _ = img.shape
    k_choice, k_lam_m, k_lam_c, k_perm, k_box = jax.random.split(rng, 5)
    one = jax.nn.one_hot(labels, num_classes)
    perm = jax.random.permutation(k_perm, B)

    # mixup
    lam_m = jax.random.beta(k_lam_m, mixup_alpha, mixup_alpha)
    img_m = lam_m * img + (1 - lam_m) * img[perm]

    # cutmix
    lam_c = jax.random.beta(k_lam_c, cutmix_alpha, cutmix_alpha)
    ratio = jnp.sqrt(1.0 - lam_c)
    cw = (W * ratio).astype(jnp.int32)
    ch = (H * ratio).astype(jnp.int32)
    kx, ky = jax.random.split(k_box)
    cx = jax.random.randint(kx, (), 0, W)
    cy = jax.random.randint(ky, (), 0, H)
    x1 = jnp.clip(cx - cw // 2, 0, W)
    x2 = jnp.clip(cx + cw // 2, 0, W)
    y1 = jnp.clip(cy - ch // 2, 0, H)
    y2 = jnp.clip(cy + ch // 2, 0, H)
    xs = jnp.arange(W)
    ys = jnp.arange(H)
    in_box = ((ys[:, None] >= y1) & (ys[:, None] < y2) &
              (xs[None, :] >= x1) & (xs[None, :] < x2))
    img_c = jnp.where(in_box[None, :, :, None], img[perm], img)
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)).astype(jnp.float32) / (H * W)

    use_cutmix = jax.random.bernoulli(k_choice, 0.5)
    img_out = jnp.where(use_cutmix, img_c, img_m)
    lam = jnp.where(use_cutmix, lam_adj, lam_m)
    target = lam * one + (1 - lam) * one[perm]
    return img_out, target


# ---------------------------------------------------------------------------
# per-task loss functions
# ---------------------------------------------------------------------------

def cls_loss_fn(model, params, batch, rng, cfg: TrainStepConfig,
                train: bool = True):
    if train and cfg.device_aug is not None and "aug_op_id" in batch:
        # on-device augment stage (RRC + flip + RandAugment + erase on
        # raw 0..255), then explicit normalize — the host pipeline's
        # Normalize-last order (ops/device_augment.py)
        from rscotr_tpu.ops.device_augment import cls_device_augment
        k_noise, rng = jax.random.split(rng)
        aug = {k[len("aug_"):]: batch[k] for k in batch
               if k.startswith("aug_")}
        img = cls_device_augment(batch["img"], aug, cfg.device_aug,
                                 noise_key=k_noise)
        mean, std = cfg.img_norm if cfg.img_norm is not None else (
            (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
        img = (img - jnp.asarray(mean)) / jnp.asarray(std)
    else:
        img = device_normalize(batch["img"], cfg.img_norm)
    labels = batch["gt_label"]
    if train and cfg.cls_use_augments:
        k_aug, rng = jax.random.split(rng)
        img, target = cls_batch_augment(
            k_aug, img, labels, cfg.cls_num_classes,
            cfg.cls_mixup_alpha, cfg.cls_cutmix_alpha)
    else:
        target = labels
    logits = model.apply(params, img, deterministic=not train,
                         rngs={"dropout": rng} if train else None,
                         method=model.forward_cls)
    loss = label_smooth_loss(logits, target,
                             label_smooth_val=cfg.cls_label_smooth)
    return {"loss_cls": loss}


def seg_loss_fn(model, params, batch, rng, cfg: TrainStepConfig,
                train: bool = True):
    if train and cfg.seg_device_aug is not None and \
            "aug_resize_h" in batch:
        # on-device augment stage (ratio resize + crop + flip +
        # photometric on raw 0..255), then normalize + pad-mask — the
        # host pipeline's Normalize-then-Pad(0) order
        from rscotr_tpu.ops.device_augment import seg_device_augment
        aug = {k[len("aug_"):]: batch[k] for k in batch
               if k.startswith("aug_")}
        img = seg_device_augment(batch["img"], aug, cfg.seg_device_aug)
        mean, std = cfg.img_norm if cfg.img_norm is not None else (
            (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
        img = (img - jnp.asarray(mean)) / jnp.asarray(std)
        img_hw = batch["img_hw"]
        B, H, W, _ = img.shape
        row = jnp.arange(H)[None, :] < img_hw[:, 0][:, None]
        col = jnp.arange(W)[None, :] < img_hw[:, 1][:, None]
        keep = (row[:, :, None] & col[:, None, :])[..., None]
        img = jnp.where(keep, img, 0.0)
    else:
        img = device_normalize(batch["img"], cfg.img_norm,
                               batch.get("img_hw"))
    gt = batch["gt_semantic_seg"]
    logits = model.apply(params, img, deterministic=not train,
                         rngs={"dropout": rng} if train else None,
                         method=model.forward_seg)
    # resize logits to label resolution (mmseg BaseDecodeHead.losses)
    logits = jax.image.resize(
        logits, (logits.shape[0], gt.shape[1], gt.shape[2],
                 logits.shape[-1]), method="linear")
    loss = softmax_cross_entropy(logits, gt,
                                 ignore_index=cfg.seg_ignore_index)
    return {"seg.loss_ce": loss * cfg.seg_loss_weight}


def det_loss_fn(model, params, batch, rng, cfg: TrainStepConfig,
                train: bool = True):
    img_hw = batch["img_hw"]
    if train and cfg.det_device_aug is not None and "aug_s2_h" in batch:
        # on-device augment stage (flip + resize/crop/resize on raw
        # 0..255 inside the static output bucket), then normalize +
        # pad-mask (ops/device_augment.det_device_augment)
        from rscotr_tpu.ops.device_augment import det_device_augment
        aug = {k[len("aug_"):]: batch[k] for k in batch
               if k.startswith("aug_")}
        out_hw = batch["out_template"].shape[1:3]
        img = det_device_augment(batch["img"], aug, out_hw,
                                 cfg.det_device_aug)
        mean, std = cfg.img_norm if cfg.img_norm is not None else (
            (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
        img = (img - jnp.asarray(mean)) / jnp.asarray(std)
        B, H, W, _ = img.shape
        row = jnp.arange(H)[None, :] < img_hw[:, 0][:, None]
        col = jnp.arange(W)[None, :] < img_hw[:, 1][:, None]
        keep = (row[:, :, None] & col[:, None, :])[..., None]
        img = jnp.where(keep, img, 0.0)
    else:
        img = device_normalize(batch["img"], cfg.img_norm, img_hw)
    gt_bboxes = batch["gt_bboxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]

    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h], -1)[:, None, :]
    gt_norm = bbox_xyxy_to_cxcywh(gt_bboxes / factor)

    label_emb = params["params"]["bbox_head"]["label_embedding"]
    k_cdn, rng = jax.random.split(rng)
    # parity hook: a batch may carry pre-drawn CDN noise (dn_noise_* keys)
    # so torch-oracle tests drive both stacks with identical draws
    noise = None
    if "dn_noise_p" in batch:
        noise = {"p": batch["dn_noise_p"],
                 "new_label": batch["dn_noise_new_label"],
                 "sign": batch["dn_noise_sign"],
                 "part": batch["dn_noise_part"]}
    # DN group widening (reference widens every group to the batch max GT
    # count — query_denoising.py:97,121-123): the collate quantizes the
    # batch max to a small static ladder and encodes the choice in the
    # zero-width ``dn_wide`` leaf's SHAPE, so each ladder width compiles
    # its own graph and no valid GT is ever dropped from DN supervision.
    cdn_cfg = cfg.cdn
    if "dn_wide" in batch:
        s_sel = int(batch["dn_wide"].shape[1])
        if s_sel != cdn_cfg.single_pad:
            cdn_cfg = dataclasses.replace(cdn_cfg, dn_max_gt=s_sel)
    dn_label_q, dn_bbox_q = generate_cdn_queries(
        k_cdn, gt_norm, gt_labels, gt_valid, label_emb, cdn_cfg,
        noise=noise)
    attn_mask = jnp.asarray(cdn_self_attn_mask(cdn_cfg))

    all_cls, all_coords, topk_score, topk_anchor = model.apply(
        params, img, img_hw, dn_label_q, dn_bbox_q, attn_mask,
        deterministic=not train,
        rngs={"dropout": rng} if train else None,
        method=model.forward_det)
    return dino_loss(all_cls, all_coords, topk_score, topk_anchor,
                     gt_bboxes, gt_labels, gt_valid, img_hw,
                     cdn_cfg, cfg.det)


LOSS_FNS = {"cls": cls_loss_fn, "det": det_loss_fn, "seg": seg_loss_fn}


def parse_losses(losses: Dict[str, jnp.ndarray]):
    """Sum all entries into total loss (reference _parse_losses)."""
    total = sum(losses.values())
    log_vars = dict(losses)
    log_vars["loss"] = total
    return total, log_vars


# ---------------------------------------------------------------------------
# step factories
# ---------------------------------------------------------------------------

def _train_step_body(model, optimizer, task: str, cfg: TrainStepConfig,
                     task_mask=None):
    """Un-jitted single-step body shared by the per-iteration and the
    K-step-scanned dispatch paths."""
    weight = float(cfg.task_weight.get(task, 1.0))
    loss_fn = LOSS_FNS[task]

    def step(params, opt_state, batch, rng):
        def lf(p):
            losses = loss_fn(model, p, batch, rng, cfg, train=True)
            total, log_vars = parse_losses(losses)
            return total * weight, log_vars

        (loss, log_vars), grads = jax.value_and_grad(lf, has_aux=True)(
            params)
        log_vars = {k: v * weight for k, v in log_vars.items()}
        new_params, new_opt, gnorm = optimizer.update(
            grads["params"] if "params" in grads else grads,
            opt_state,
            params["params"] if "params" in params else params,
            task_mask)
        out_params = dict(params)
        out_params["params"] = new_params
        log_vars["grad_norm"] = gnorm
        return out_params, new_opt, log_vars

    return step


def make_train_step(model, optimizer, task: str, cfg: TrainStepConfig,
                    task_mask=None, donate: bool = True):
    """Returns jitted step(params, opt_state, batch, rng) ->
    (params, opt_state, log_vars)."""
    step = _train_step_body(model, optimizer, task, cfg, task_mask)
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_scan_train_step(model, optimizer, task: str, cfg: TrainStepConfig,
                         task_mask=None, donate: bool = True):
    """K steps of one task inside ONE jitted ``lax.scan`` dispatch.

    The per-iteration runner pays host dispatch (pytree flatten + RPC
    marshalling of ~3k leaves) for every step — measured 0.35-0.85 s/iter
    against a 0.02-0.18 s device step on this host (PERF.md). Scanning K
    same-shape steps amortizes that to 1/K; this is the production twin of
    bench.py's scan trick (reference hot loop: one train_step per
    DataLoader draw — SURVEY.md §3.1).

    Returns jitted
        scan_step(params, opt_state, batches, root_key, step_idxs)
            -> (params, opt_state, log_vars stacked over K)
    where ``batches`` has a leading K axis on every leaf and ``step_idxs``
    is the (K,) int32 array of global step numbers; each step's rng is
    ``fold_in(root_key, step_idx)`` — exactly the per-iteration runner's
    stream, so a K=1 dispatch is bit-identical to make_train_step.

    Numerics note (measured 2026-08-19, flagship det shapes on v5e bf16):
    the scan body and the standalone step are semantically identical but
    XLA fuses them differently, so trajectories agree to ~4 decimals for
    tens of steps and then drift at the ulp level (K=8 vs K=1 losses
    identical through iter 40, diverged ≤0.2% by iter 48). Different K
    values of the scan path agree bit-exactly with each other. The exact
    f32 bit-identity contract is tested on CPU (tests/test_scan_dispatch).
    """
    body = _train_step_body(model, optimizer, task, cfg, task_mask)

    def scan_step(params, opt_state, batches, root_key, step_idxs):
        def f(carry, x):
            p, o = carry
            batch, idx = x
            rng = jax.random.fold_in(root_key, idx)
            p, o, lv = body(p, o, batch, rng)
            return (p, o), lv

        (params, opt_state), lvs = jax.lax.scan(
            f, (params, opt_state), (batches, step_idxs))
        return params, opt_state, lvs

    return jax.jit(scan_step, donate_argnums=(0, 1) if donate else ())


def make_val_step(model, task: str, cfg: TrainStepConfig):
    weight = float(cfg.task_weight.get(task, 1.0))
    loss_fn = LOSS_FNS[task]

    def step(params, batch, rng):
        losses = loss_fn(model, params, batch, rng, cfg, train=False)
        total, log_vars = parse_losses(losses)
        return {k: v * weight for k, v in log_vars.items()}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# inference steps (reference simple_test_{task})
# ---------------------------------------------------------------------------

def _slide_origins(size: int, crop: int, stride: int):
    """mmseg slide_inference window origins (static python ints)."""
    n = max(size - crop + stride - 1, 0) // stride + 1
    return sorted({min(i * stride, size - crop) for i in range(n)})


def make_infer_steps(model, max_per_img: int = 300, img_norm=None,
                     seg_test_cfg=None):
    """Per-task jitted inference steps.

    ``seg_test_cfg``: the config's ``model.test_cfg.seg`` dict. ``mode``
    'whole' (default) resizes the logits to the full image;
    ``mode='slide'`` reproduces mmseg ``EncoderDecoder.slide_inference``
    (the reference's ``RSCoTrSeg`` inherits both modes from mmseg —
    /root/reference/models/seg/rscotr_seg.py:9-25): overlapping
    ``crop_size`` windows at ``stride``, per-window logits accumulated
    into a canvas and count-normalized before the argmax. TPU-first: the
    window origins are STATIC (derived from the static image shape), the
    windows run through ONE compiled body via ``lax.scan`` (dynamic_slice
    in, dynamic_update_slice accumulate out), so arbitrarily many windows
    cost one trace."""
    from rscotr_tpu.models.heads.dino_loss import dino_get_bboxes

    @jax.jit
    def infer_cls(params, img):
        img = device_normalize(img, img_norm)
        logits = model.apply(params, img, deterministic=True,
                             method=model.forward_cls)
        return jax.nn.softmax(logits, axis=-1)

    @jax.jit
    def infer_det(params, img, img_hw, scale_factor):
        img = device_normalize(img, img_norm, img_hw)
        all_cls, all_coords, _, _ = model.apply(
            params, img, img_hw, None, None, None, deterministic=True,
            method=model.forward_det)
        return dino_get_bboxes(all_cls[-1], all_coords[-1], img_hw,
                               scale_factor, max_per_img=max_per_img,
                               rescale=True)

    stc = dict(seg_test_cfg or {})
    if stc.get("mode", "whole") == "slide":
        hc, wc = (int(v) for v in stc["crop_size"])
        hs, ws = (int(v) for v in stc["stride"])

        def seg_logits_fn(params, img):
            img = device_normalize(img, img_norm)
            B, H, W, Cin = img.shape
            if H < hc or W < wc:
                raise ValueError(
                    f"slide inference needs image >= crop_size; got "
                    f"({H},{W}) < ({hc},{wc}) — pad in the test pipeline")
            origins = jnp.asarray(
                [(y, x) for y in _slide_origins(H, hc, hs)
                 for x in _slide_origins(W, wc, ws)], jnp.int32)

            C = jax.eval_shape(
                lambda p: model.apply(
                    p, jnp.zeros((B, hc, wc, Cin), jnp.float32),
                    deterministic=True, method=model.forward_seg),
                params).shape[-1]

            def body(carry, origin):
                pred, cnt = carry
                y, x = origin[0], origin[1]
                crop = jax.lax.dynamic_slice(
                    img, (0, y, x, 0), (B, hc, wc, Cin))
                logits = model.apply(params, crop, deterministic=True,
                                     method=model.forward_seg)
                logits = jax.image.resize(
                    logits, (B, hc, wc, logits.shape[-1]),
                    method="linear").astype(jnp.float32)
                patch = jax.lax.dynamic_slice(
                    pred, (0, y, x, 0), (B, hc, wc, pred.shape[-1]))
                pred = jax.lax.dynamic_update_slice(
                    pred, patch + logits, (0, y, x, 0))
                cpatch = jax.lax.dynamic_slice(cnt, (y, x), (hc, wc))
                cnt = jax.lax.dynamic_update_slice(
                    cnt, cpatch + 1.0, (y, x))
                return (pred, cnt), None

            pred0 = jnp.zeros((B, H, W, int(C)), jnp.float32)
            cnt0 = jnp.zeros((H, W), jnp.float32)
            (pred, cnt), _ = jax.lax.scan(body, (pred0, cnt0), origins)
            return pred / cnt[None, :, :, None]
    else:
        def seg_logits_fn(params, img):
            img = device_normalize(img, img_norm)
            logits = model.apply(params, img, deterministic=True,
                                 method=model.forward_seg)
            # bilinear logits resize to the (padded) input resolution —
            # first stage of the reference's whole_inference_seg
            # (multitask_learner.py:171-179)
            return jax.image.resize(
                logits, (img.shape[0], img.shape[1], img.shape[2],
                         logits.shape[-1]), method="linear")

    # ``seg``: label maps at input resolution (demo/bench/export path).
    # ``seg_logits``: f32 logits at input resolution — the eval stack crops
    # to img_shape and bilinearly resizes to ori_shape BEFORE the argmax,
    # matching the reference (multitask_learner.py:171-195,217-227).
    infer_seg_logits = jax.jit(seg_logits_fn)

    @jax.jit
    def infer_seg(params, img):
        return jnp.argmax(seg_logits_fn(params, img), axis=-1)

    return {"cls": infer_cls, "det": infer_det, "seg": infer_seg,
            "seg_logits": infer_seg_logits}
