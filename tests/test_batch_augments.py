"""On-device cls batch augments (mmcls BatchMixup/BatchCutMix equivalent).

The reference wraps mmcls ``Augments`` (BatchMixup alpha=0.8 p=0.5 /
BatchCutMix alpha=1.0 p=0.5 — flagship config train_cfg, SURVEY §3.4);
here both run inside the jitted step (`engine/train_step.py::
cls_batch_augment`). Each call picks ONE of the two (p=0.5), so every
output must be exactly one of:

* mixup: every pixel is the SAME convex combination
  ``lam * img + (1-lam) * img[perm]``;
* cutmix: every pixel equals ``img`` or ``img[perm]``, and the pasted
  fraction is exactly ``1 - lam`` (lam re-derived from the clipped box).

In both cases the soft target must be ``lam * onehot + (1-lam) *
onehot[perm]`` with the SAME lam.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu.engine.train_step import cls_batch_augment

B, H, W, C = 4, 16, 16, 5


def _run(seed):
    # image b is constant-valued b -> per-pixel provenance is readable
    img = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.float32)[:, None, None, None],
        (B, H, W, 3))
    labels = jnp.arange(B, dtype=jnp.int32)   # distinct classes
    out, target = cls_batch_augment(jax.random.key(seed), img, labels, C)
    return np.asarray(out), np.asarray(target)


def _lam_perm_from_target(target):
    """Recover (lam, perm) from the soft targets (labels are 0..B-1)."""
    perm = np.full(B, -1)
    lams = []
    for i in range(B):
        nz = np.nonzero(target[i] > 1e-6)[0]
        if len(nz) == 1:        # perm[i] == i (self-pair)
            perm[i] = i
            continue
        assert len(nz) == 2
        j = int(nz[nz != i][0])
        perm[i] = j
        lams.append(target[i, i])
    assert len(set(np.round(lams, 6))) <= 1, "lam must be batch-global"
    return (float(lams[0]) if lams else 1.0), perm


class TestClsBatchAugment:
    def test_every_seed_is_exact_mixup_or_cutmix(self):
        saw = set()
        for seed in range(12):
            out, target = _run(seed)
            np.testing.assert_allclose(target.sum(-1), 1.0, rtol=1e-6)
            lam, perm = _lam_perm_from_target(target)
            base = np.arange(B, dtype=np.float32)
            mixed = lam * base + (1 - lam) * base[perm]
            pix = out[..., 0]                       # (B, H, W)
            is_mixup = np.allclose(
                pix, mixed[:, None, None], atol=1e-5)
            if is_mixup:
                saw.add("mixup")
                continue
            # cutmix: pixels come from self or partner; pasted fraction
            # is exactly 1-lam (lam_adj derives from the integer box)
            saw.add("cutmix")
            for i in range(B):
                vals = np.unique(pix[i])
                assert set(np.round(vals, 5)) <= {float(i),
                                                  float(perm[i])}
                frac_pasted = np.mean(pix[i] != i) if perm[i] != i else 0.0
                if perm[i] != i:
                    np.testing.assert_allclose(frac_pasted, 1 - lam,
                                               atol=1e-6)
        assert saw == {"mixup", "cutmix"}, saw

    def test_disabled_in_eval_path(self):
        """cls_loss_fn applies augments only when train and configured —
        eval logits are computed on the raw batch (reference applies
        Augments in forward_train only, multitask_learner.py:119-121)."""
        from rscotr_tpu.engine.train_step import TrainStepConfig, cls_loss_fn

        class Id:
            def apply(self, params, img, deterministic=True, rngs=None,
                      method=None):
                # logits = per-image mean -> depends on augmentation
                return jnp.tile(img.mean(axis=(1, 2, 3))[:, None], (1, C))

            forward_cls = "fwd"

        cfg = TrainStepConfig(task_weight={"cls": 1.0}, cls_num_classes=C,
                              cls_use_augments=True, img_norm=None)
        img = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.float32)[:, None, None, None],
            (B, H, W, 3))
        batch = {"img": img, "gt_label": jnp.arange(B, dtype=jnp.int32)}
        l_eval1 = cls_loss_fn(Id(), {}, batch, jax.random.key(0), cfg,
                              train=False)["loss_cls"]
        l_eval2 = cls_loss_fn(Id(), {}, batch, jax.random.key(1), cfg,
                              train=False)["loss_cls"]
        assert float(l_eval1) == float(l_eval2)   # rng-independent
