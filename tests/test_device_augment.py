"""On-device cls augmentation parity vs the host/PIL pipeline.

VERDICT r2 #3: the cls augment tail (RandomResizedCrop, RandomFlip,
RandAugment, RandomErasing) moves on device; these tests drive the device
ops and the host pipeline with IDENTICAL parameters (the planner shares
the hosts' draw_* methods, so the distributions are equal by
construction) and bound the pixel differences:

* pointwise ops: PIL integer semantics reproduced to <= 2 gray levels
* geometric ops (3-pass shear warp vs PIL single-pass bicubic): mean
  diff < 1 level, < 1.5% of pixels off by > 5 (fill-seam pixels)
* the full composed stage end-to-end on planner-drawn parameters
* loader integration: cls_device_augment batches carry aug_* records and
  run through the jitted cls train step
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rscotr_tpu.data import pipelines as P  # noqa: E402
from rscotr_tpu.ops import device_augment as D  # noqa: E402

pytestmark = pytest.mark.skipif(not P.HAS_PIL, reason="needs PIL")

S, O = 96, 64          # scaled-down src/out keep CPU runtime sane


def _smooth_images(b=3, size=S, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (b, size, size, 3)).astype(np.float32)
    # box-blur twice so interpolation differences are signal, not noise
    for _ in range(2):
        img = (img + np.roll(img, 1, 1) + np.roll(img, -1, 1) +
               np.roll(img, 1, 2) + np.roll(img, -1, 2)) / 5.0
    return np.round(np.clip(img, 0, 255))


HOST_OPS = {n: (f, s) for n, f, s in P.RAND_AUG_OPS}
CANON = {n: i for i, n in enumerate(D.RAND_AUG_OP_NAMES)}
FILL = (124.0, 116.0, 104.0)


def _device_op(base, name, m):
    B = base.shape[0]
    out = D.apply_rand_augment_slot(
        jnp.asarray(base), jnp.full((B,), CANON[name], jnp.int32),
        jnp.full((B,), m, jnp.float32), FILL)
    return np.asarray(out)


def _host_op(base, name, m):
    fn = HOST_OPS[name][0]
    return np.stack([fn(base[b].copy(), m) for b in range(len(base))])


class TestPointwiseOps:
    @pytest.mark.parametrize("name,mags", [
        ("AutoContrast", (0.9,)), ("Equalize", (0.9,)),
        ("Invert", (0.9,)), ("Posterize", (0.2, 0.9)),
        ("Solarize", (0.2, 0.9)), ("SolarizeAdd", (0.5, 0.9)),
        ("ColorTransform", (0.9, -0.9)), ("Contrast", (0.9, -0.9)),
        ("Brightness", (0.9, -0.9)), ("Sharpness", (0.9, -0.9)),
    ])
    def test_matches_host(self, name, mags):
        base = _smooth_images()
        for m in mags:
            got = _device_op(base, name, m)
            want = _host_op(base, name, m)
            assert np.abs(got - want).max() <= 2.0, (name, m)


class TestGeometricOps:
    @pytest.mark.parametrize("name,mags,mean_tol,frac5_tol", [
        # single-pass warps: sub-level agreement with PIL
        ("Shear", (0.5, -0.8), 1.0, 0.015),
        ("ShearY", (0.5, -0.8), 1.0, 0.015),
        ("Translate", (0.4, -0.8), 1.0, 0.015),
        ("TranslateY", (0.4, -0.8), 1.0, 0.015),
        # rotation: 3-shear decomposition resamples three times, so on
        # high-frequency content it low-passes slightly more than PIL's
        # single-pass bicubic (a documented backend-level deviation, like
        # mmcls' own PIL-vs-cv2 backends); alignment itself is sub-pixel
        # exact (test_rotation_alignment_smooth)
        ("Rotate", (0.5, -0.9), 3.5, 0.16),
    ])
    def test_matches_pil_warp(self, name, mags, mean_tol, frac5_tol):
        base = _smooth_images()
        for m in mags:
            got = _device_op(base, name, m)
            want = _host_op(base, name, m)
            d = np.abs(got - want)
            assert d.mean() < mean_tol, (name, m, d.mean())
            assert (d > 5).mean() < frac5_tol, (name, m, (d > 5).mean())

    def test_rotation_alignment_smooth(self):
        """On smooth content (filter differences vanish) rotation must
        agree with PIL to a fraction of a gray level — proves the 3-shear
        geometry (center, direction, half-pixel convention) is exact."""
        from scipy.ndimage import gaussian_filter
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (2, S, S, 3)).astype(np.float32)
        base = np.round(np.stack(
            [gaussian_filter(im, (5, 5, 0)) for im in base]))
        for m in (0.5, -0.9):
            got = _device_op(base, "Rotate", m)
            want = _host_op(base, "Rotate", m)
            # central crop keeps clear of the rotated fill wedges
            d = np.abs(got - want)[:, 24:-24, 24:-24]
            assert d.max() <= 3, (m, d.max())
            assert d.mean() < 1.0, (m, d.mean())

    def test_rotation_direction(self):
        """Spot test pins the PIL counterclockwise convention."""
        from PIL import Image
        img = np.zeros((O, O, 3), np.float32)
        img[8:16, 44:52] = 255.0
        m = 0.5
        want = np.asarray(Image.fromarray(img.astype(np.uint8)).rotate(
            m * 30, Image.BICUBIC), np.float32)
        got = _device_op(img[None], "Rotate", m)[0]
        inter = np.minimum(want[..., 0], got[..., 0]).sum()
        assert inter / max(want[..., 0].sum(), 1) > 0.9


class TestRandomResizedCrop:
    def test_matches_pil_crop_resize(self):
        from PIL import Image
        base = _smooth_images()
        B = len(base)
        rng = np.random.default_rng(1)
        cy, cx = rng.integers(0, 20, B), rng.integers(0, 20, B)
        ch, cw = rng.integers(30, 77, B), rng.integers(30, 77, B)
        got = np.asarray(D.random_resized_crop(
            jnp.asarray(base), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(ch), jnp.asarray(cw), O))
        want = np.stack([
            np.asarray(Image.fromarray(base[b].astype(np.uint8)).crop(
                (cx[b], cy[b], cx[b] + cw[b], cy[b] + ch[b])).resize(
                (O, O), Image.BICUBIC), np.float32) for b in range(B)])
        assert np.abs(got - want).max() <= 2.0


class TestComposedStage:
    def test_planner_plus_device_equals_host_pipeline(self):
        """Same per-sample rng -> the planner draws the SAME parameters
        the host ops would (shared draw_* methods), and the device stage
        reproduces the host pixels within interpolation tolerance.

        src == out here so RandomResizedCrop is resize-free: histogram
        ops (Equalize/AutoContrast) are CHAOTIC amplifiers — a benign
        +-1-level resize-rounding difference on a peaked histogram moves
        LUT steps by tens of levels, so pixelwise comparison through
        them is only well-posed on exactly-equal inputs. RRC resize
        parity itself is covered exactly in TestRandomResizedCrop."""
        rrc_kw = dict(size=O, interpolation="bicubic",
                      scale=(1.0, 1.0), ratio=(1.0, 1.0))
        # Equalize/AutoContrast are excluded from the pool here for the
        # same chaotic-amplification reason (a warp's fill-seam pixels
        # shift their histograms); both are op-level tested EXACTLY in
        # TestPointwiseOps. All 13 remaining ops stay in play.
        policies = [dict(type=n) for n in D.RAND_AUG_OP_NAMES
                    if n not in ("Equalize", "AutoContrast",
                                 "ShearY", "TranslateY")]
        policies += [dict(type="Shear", direction="vertical"),
                     dict(type="Translate", direction="vertical")]
        ra_kw = dict(policies=policies, num_policies=2,
                     magnitude_level=9, magnitude_std=0.5)
        planner = P.DeviceAugmentPlanner(
            rrc=rrc_kw,
            flip=dict(flip_prob=0.5, direction="horizontal"),
            rand_aug=ra_kw,
            erase=dict(erase_prob=0.5, mode="rand",
                       fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
            src_size=O)
        host_tail = [P.RandomResizedCrop(**rrc_kw),
                     P.RandomFlip(flip_prob=0.5, direction="horizontal"),
                     P.RandAugment(**ra_kw),
                     P.RandomErasing(erase_prob=0.5, mode="rand",
                                     fill_color=[104, 116, 124],
                                     fill_std=[0, 0, 0])]
        imgs = _smooth_images(b=6, size=O, seed=3)
        cfg = D.DeviceAugmentConfig(
            src_size=O, out_size=O, erase_fill=(104., 116., 124.),
            erase_fill_std=(0., 0., 0.), num_policies=2)
        samples, wants = [], []
        for i in range(len(imgs)):
            s = planner({"img": imgs[i].copy(),
                         "gt_label": np.int32(0)},
                        np.random.Generator(np.random.PCG64(50 + i)))
            samples.append(s)
            h = {"img": imgs[i].copy()}
            rng_h = np.random.Generator(np.random.PCG64(50 + i))
            for t in host_tail:
                h = t(h, rng_h)
            wants.append(h["img"])
        from rscotr_tpu.data.loader import collate_cls_aug
        batch = collate_cls_aug(samples)
        aug = {k[len("aug_"):]: jnp.asarray(v) for k, v in batch.items()
               if k.startswith("aug_")}
        got = np.asarray(D.cls_device_augment(
            jnp.asarray(batch["img"]), aug, cfg,
            noise_key=jax.random.key(0)))
        want = np.stack(wants)
        d = np.abs(got - want)
        # rotation draws (~13% of slots) carry the 3-pass deviation
        assert d.mean() < 2.5, d.mean()
        assert (d > 5).mean() < 0.06, (d > 5).mean()


class TestLoaderIntegration:
    def _loaders(self):
        from rscotr_tpu.data import build_dataloaders
        from rscotr_tpu.data.datasets import SyntheticClsDataset
        ds = SyntheticClsDataset(length=8, img_size=S, num_classes=7)
        ds.pipeline_cfg = [
            dict(type="RandomResizedCrop", size=O,
                 interpolation="bicubic"),
            dict(type="RandomFlip", flip_prob=0.5),
            dict(type="RandAugment", num_policies=2, magnitude_level=9,
                 magnitude_std=0.5),
            dict(type="RandomErasing", erase_prob=0.25, mode="rand",
                 fill_color=[104, 116, 124], fill_std=[0, 0, 0]),
            dict(type="Normalize"),
        ]
        ds.task = "cls"
        data_cfg = {"r": {"task": "cls",
                          "data": {"samples_per_gpu": 4},
                          "loader": {"cls_device_augment": True,
                                     "cls_src_size": S}}}
        return build_dataloaders({"r": ds}, data_cfg, train=True,
                                 num_replicas=1, rank=0,
                                 num_threads=1)["r"]

    def test_batch_carries_params_and_step_runs(self):
        dl = self._loaders()
        batch = next(iter(dl))
        assert batch["img"].dtype == np.uint8
        assert batch["img"].shape == (4, S, S, 3)
        assert batch["aug_op_id"].shape == (4, 2)
        assert batch["aug_crop_h"].min() > 0

        import flax.linen as nn

        class Mini(nn.Module):
            @nn.compact
            def forward_cls(self, img, deterministic=True):
                return nn.Dense(7)(img.mean(axis=(1, 2)))

            def __call__(self, img, deterministic=True):
                return self.forward_cls(img, deterministic)

        from rscotr_tpu.engine.optimizer import build_optimizer
        from rscotr_tpu.engine.train_step import (TrainStepConfig,
                                                  make_train_step)
        model = Mini()
        params = model.init(jax.random.key(0), jnp.zeros((1, O, O, 3)))
        cfg = TrainStepConfig(
            task_weight={"cls": 1.0}, cls_num_classes=7,
            cls_use_augments=False,
            img_norm=((123.675, 116.28, 103.53),
                      (58.395, 57.12, 57.375)),
            device_aug=D.DeviceAugmentConfig(
                src_size=S, out_size=O,
                erase_fill=(104., 116., 124.)))
        opt = build_optimizer(dict(type="AdamW", lr=1e-3),
                              params["params"],
                              lr_config=dict(policy="fixed"))
        step = make_train_step(model, opt, "cls", cfg, donate=False)
        p2, o2, lv = step(params, opt.init(params["params"]),
                          {k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.key(1))
        assert np.isfinite(float(lv["loss"]))


# ---------------------------------------------------------------------------
# seg on-device augmentation (VERDICT r3 #1)
# ---------------------------------------------------------------------------

class TestPilHsv:
    def _rand_rgb(self, n=40000, seed=0):
        return np.random.default_rng(seed).integers(
            0, 256, (n, 3), dtype=np.uint8)

    def test_rgb2hsv_vs_pil(self):
        from PIL import Image
        rgb = self._rand_rgb()
        want = np.asarray(Image.fromarray(
            rgb.reshape(1, -1, 3), "RGB").convert("HSV"),
            np.int32).reshape(-1, 3)
        h, s, v = D.pil_rgb_to_hsv(jnp.asarray(rgb.reshape(1, -1, 1, 3),
                                               jnp.float32))
        got = np.stack([np.asarray(x).reshape(-1) for x in (h, s, v)], -1)
        d = np.abs(got - want)
        # S and V bit-exact; H +-1 on Pillow's float64-truncation ties
        assert d[:, 1].max() == 0 and d[:, 2].max() == 0
        assert d[:, 0].max() <= 1
        assert (d[:, 0] == 0).mean() > 0.85

    def test_hsv2rgb_vs_pil(self):
        from PIL import Image
        hsv = self._rand_rgb(seed=1)
        want = np.asarray(Image.fromarray(
            hsv.reshape(1, -1, 3), "HSV").convert("RGB"),
            np.int32).reshape(-1, 3)
        f = [jnp.asarray(hsv[:, k].reshape(1, -1, 1), jnp.float32)
             for k in range(3)]
        got = np.asarray(D.pil_hsv_to_rgb(*f)).reshape(-1, 3)
        d = np.abs(got - want)
        # f64 round-half-even is bit-exact vs Pillow (exhaustively
        # probed over all 256^3 inputs, 2026-08-21); f32 can land +-1
        # on near-tie fractions, which shifts RGB by <= a few levels
        assert d.max() <= 6
        assert (d == 0).mean() > 0.95

    def test_photometric_vs_host(self):
        base = _smooth_images(b=8, size=48, seed=5)
        pm_host = P.PhotoMetricDistortion()
        params, wants = [], []
        for i in range(len(base)):
            rng = np.random.Generator(np.random.PCG64(200 + i))
            p = pm_host.draw_params(rng)
            params.append(p)
            wants.append(pm_host.apply_params(base[i].copy(), p))
        pm = {
            "bright": jnp.asarray([p["bright"] for p in params],
                                  jnp.float32),
            "c_pre": jnp.asarray([p["c_pre"] for p in params],
                                 jnp.float32),
            "hsv_on": jnp.asarray([p["hsv_on"] for p in params], bool),
            "sat": jnp.asarray([p["sat"] for p in params], jnp.float32),
            "hue": jnp.asarray([p["hue"] for p in params], jnp.float32),
            "c_post": jnp.asarray([p["c_post"] for p in params],
                                  jnp.float32),
        }
        got = np.asarray(D.photometric_distortion(jnp.asarray(base), pm))
        want = np.stack(wants)
        d = np.abs(got - want)
        assert d.mean() < 0.5, d.mean()
        assert (d > 6).mean() < 0.01, (d > 6).mean()

    def test_draw_params_matches_legacy_stream(self):
        """draw_params + apply_params must consume the same rng stream
        and produce the same pixels as the pre-refactor __call__ (the
        host pipeline's behavior is the parity anchor)."""
        base = _smooth_images(b=2, size=32, seed=6)
        op = P.PhotoMetricDistortion()
        for i in range(6):
            r1 = np.random.Generator(np.random.PCG64(300 + i))
            r2 = np.random.Generator(np.random.PCG64(300 + i))
            out = op({"img": base[0].copy()}, r1)["img"]
            p = op.draw_params(r2)
            # identical rng stream position after the draws
            assert r1.integers(1 << 30) == r2.integers(1 << 30)
            out2 = op.apply_params(base[0].copy(), p)
            assert np.array_equal(out, out2)


class TestPilResampleMatrix:
    def test_full_resize_matches_pil_bilinear(self):
        from PIL import Image
        base = _smooth_images(b=4, size=S, seed=7)
        new_len = np.asarray([40, 64, 96, 128], np.int32)  # down+up
        B = len(base)
        zeros = jnp.zeros((B,), jnp.int32)
        src = jnp.full((B,), S, jnp.int32)
        my = D.pil_resample_matrix(128, S, zeros, src, zeros,
                                   jnp.asarray(new_len),
                                   jnp.asarray(new_len),
                                   kernel="bilinear")
        mx = my
        got = np.asarray(D.apply_resample(jnp.asarray(base), my, mx))
        got = np.clip(np.round(got), 0, 255)
        for b in range(B):
            n = int(new_len[b])
            want = np.asarray(Image.fromarray(
                base[b].astype(np.uint8)).resize((n, n), Image.BILINEAR),
                np.float32)
            d = np.abs(got[b, :n, :n] - want)
            assert d.max() <= 2.0, (b, d.max())
            assert np.abs(got[b, n:, :]).max() == 0 if n < 128 else True

    def test_resize_then_crop_matches_pil(self):
        from PIL import Image
        base = _smooth_images(b=3, size=S, seed=8)
        B = len(base)
        new_len = np.asarray([150, 100, 96], np.int32)
        crop0 = np.asarray([10, 20, 0], np.int32)
        crop_len = np.asarray([64, 64, 64], np.int32)
        flip = np.asarray([False, True, False])
        zeros = jnp.zeros((B,), jnp.int32)
        src = jnp.full((B,), S, jnp.int32)
        my = D.pil_resample_matrix(64, S, zeros, src,
                                   jnp.asarray(crop0),
                                   jnp.asarray(new_len),
                                   jnp.asarray(crop_len),
                                   kernel="bilinear")
        mx = D.pil_resample_matrix(64, S, zeros, src,
                                   jnp.asarray(crop0),
                                   jnp.asarray(new_len),
                                   jnp.asarray(crop_len),
                                   kernel="bilinear",
                                   mirror_out=jnp.asarray(flip))
        got = np.clip(np.round(np.asarray(
            D.apply_resample(jnp.asarray(base), my, mx))), 0, 255)
        for b in range(B):
            n, c0, cl = int(new_len[b]), int(crop0[b]), int(crop_len[b])
            w = np.asarray(Image.fromarray(
                base[b].astype(np.uint8)).resize((n, n), Image.BILINEAR),
                np.float32)[c0:c0 + cl, c0:c0 + cl]
            if flip[b]:
                w = w[:, ::-1]
            d = np.abs(got[b, :cl, :cl] - w)
            assert d.max() <= 2.0, (b, d.max())


class TestSegDeviceAugment:
    SRC = 128

    def _fixtures(self, B=6):
        Sz = self.SRC
        resize_kw = dict(img_scale=(Sz, Sz), ratio_range=(0.5, 2.0))
        crop_kw = dict(crop_size=(Sz, Sz), cat_max_ratio=0.75,
                       ignore_index=255)
        flip_kw = dict(prob=0.5)
        pad_kw = dict(size=(Sz, Sz), pad_val=0, seg_pad_val=5)
        host_tail = [P.Resize(**resize_kw), P.RandomCrop(**crop_kw),
                     P.RandomFlip(**flip_kw), P.PhotoMetricDistortion(),
                     P.Pad(**pad_kw)]
        planner = P.SegDeviceAugmentPlanner(
            resize=resize_kw, crop=crop_kw, flip=flip_kw,
            photometric={}, pad=pad_kw, src_size=Sz)
        imgs = _smooth_images(b=B, size=Sz, seed=11)
        label = ((np.arange(Sz)[:, None] // 16 +
                  np.arange(Sz)[None, :] // 16) % 5).astype(np.uint8)
        samples, hosts = [], []
        for i in range(B):
            s = planner({"img": imgs[i].copy(),
                         "gt_semantic_seg": label.copy(),
                         "ori_shape": (Sz, Sz, 3)},
                        np.random.Generator(np.random.PCG64(400 + i)))
            samples.append(s)
            h = {"img": imgs[i].copy(), "gt_semantic_seg": label.copy()}
            rh = np.random.Generator(np.random.PCG64(400 + i))
            for t in host_tail:
                h = t(h, rh)
            hosts.append(h)
        return samples, hosts

    def test_planner_plus_device_equals_host_pipeline(self):
        from rscotr_tpu.data.loader import collate_seg_aug
        samples, hosts = self._fixtures()
        batch = collate_seg_aug(samples)
        # labels (host-side in both paths) must be BIT-identical
        want_seg = np.stack([h["gt_semantic_seg"] for h in hosts])
        assert np.array_equal(batch["gt_semantic_seg"],
                              want_seg.astype(np.int32))
        aug = {k[len("aug_"):]: jnp.asarray(v) for k, v in batch.items()
               if k.startswith("aug_")}
        cfg = D.SegDeviceAugmentConfig(src_size=self.SRC,
                                       out_size=self.SRC)
        got = np.asarray(D.seg_device_augment(
            jnp.asarray(batch["img"]), aug, cfg))
        want = np.stack([h["img"] for h in hosts])
        hw = batch["img_hw"]
        for i in range(len(samples)):
            ch, cw = int(hw[i, 0]), int(hw[i, 1])
            d = np.abs(got[i, :ch, :cw] - want[i, :ch, :cw])
            # PIL bilinear fixed-point + f32 HSV: sub-level mean,
            # no pixel further than a hue-quantum step
            assert d.mean() < 0.6, (i, d.mean())
            assert (d > 5).mean() < 0.002, (i, (d > 5).mean())

    def test_step_masks_pad_region(self):
        """After normalize the pad region must be exactly 0 (the host's
        Normalize-then-Pad(0) zeros), even though the raw device output
        picks up photometric adds there."""
        from rscotr_tpu.data.loader import collate_seg_aug
        samples, _ = self._fixtures(B=4)
        batch = collate_seg_aug(samples)
        hw = batch["img_hw"]
        if not (hw < self.SRC).any():
            pytest.skip("no padded sample drawn")
        aug = {k[len("aug_"):]: jnp.asarray(v) for k, v in batch.items()
               if k.startswith("aug_")}
        cfg = D.SegDeviceAugmentConfig(src_size=self.SRC,
                                       out_size=self.SRC)
        img = D.seg_device_augment(jnp.asarray(batch["img"]), aug, cfg)
        mean = jnp.asarray((123.675, 116.28, 103.53))
        std = jnp.asarray((58.395, 57.12, 57.375))
        x = (img - mean) / std
        row = jnp.arange(self.SRC)[None, :] < hw[:, 0][:, None]
        col = jnp.arange(self.SRC)[None, :] < hw[:, 1][:, None]
        keep = (row[:, :, None] & col[:, None, :])[..., None]
        x = jnp.where(keep, x, 0.0)
        x = np.asarray(x)
        for i in range(len(samples)):
            ch, cw = int(hw[i, 0]), int(hw[i, 1])
            if ch < self.SRC:
                assert np.abs(x[i, ch:, :]).max() == 0
            if cw < self.SRC:
                assert np.abs(x[i, :, cw:]).max() == 0

    def test_loader_integration_and_train_step(self):
        from rscotr_tpu.data import build_dataloaders
        from rscotr_tpu.data.datasets import SyntheticSegDataset
        Sz = self.SRC
        ds = SyntheticSegDataset(length=4, img_size=Sz, num_classes=5)
        ds.pipeline_cfg = [
            dict(type="Resize", img_scale=(Sz, Sz),
                 ratio_range=(0.5, 2.0)),
            dict(type="RandomCrop", crop_size=(Sz, Sz),
                 cat_max_ratio=0.75, ignore_index=255),
            dict(type="RandomFlip", prob=0.5),
            dict(type="PhotoMetricDistortion"),
            dict(type="Normalize"),
            dict(type="Pad", size=(Sz, Sz), pad_val=0, seg_pad_val=5),
        ]
        ds.task = "seg"
        data_cfg = {"p": {"task": "seg",
                          "data": {"samples_per_gpu": 2},
                          "loader": {"seg_device_augment": True,
                                     "seg_size": Sz}}}
        dl = build_dataloaders({"p": ds}, data_cfg, train=True,
                               num_replicas=1, rank=0,
                               num_threads=1)["p"]
        batch = next(iter(dl))
        assert batch["img"].dtype == np.uint8
        assert batch["img"].shape == (2, Sz, Sz, 3)
        assert batch["gt_semantic_seg"].shape == (2, Sz, Sz)
        assert "aug_pm_hsv_on" in batch

        import flax.linen as nn

        class MiniSeg(nn.Module):
            @nn.compact
            def forward_seg(self, img, deterministic=True):
                x = nn.Conv(8, (3, 3), strides=2)(img)
                return nn.Conv(5, (1, 1))(x)

            def __call__(self, img, deterministic=True):
                return self.forward_seg(img, deterministic)

        from rscotr_tpu.engine.optimizer import build_optimizer
        from rscotr_tpu.engine.train_step import (TrainStepConfig,
                                                  make_train_step)
        model = MiniSeg()
        params = model.init(jax.random.key(0), jnp.zeros((1, Sz, Sz, 3)))
        cfg = TrainStepConfig(
            task_weight={"seg": 1.0}, seg_ignore_index=5,
            img_norm=((123.675, 116.28, 103.53),
                      (58.395, 57.12, 57.375)),
            seg_device_aug=D.SegDeviceAugmentConfig(src_size=Sz,
                                                    out_size=Sz))
        opt = build_optimizer(dict(type="AdamW", lr=1e-3),
                              params["params"],
                              lr_config=dict(policy="fixed"))
        step = make_train_step(model, opt, "seg", cfg, donate=False)
        p2, o2, lv = step(params, opt.init(params["params"]),
                          {k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.key(1))
        assert np.isfinite(float(lv["loss"]))


# ---------------------------------------------------------------------------
# det on-device augmentation (VERDICT r3 #1)
# ---------------------------------------------------------------------------

class TestDetDeviceAugment:
    SRC = 160   # stands in for DIOR's 800 (keeps CPU runtime sane)

    # reference pipeline shapes scaled by 160/800 (= /5):
    MTL_TAIL = [
        dict(type="Resize", img_scale=(266, 160), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="Normalize"),
    ]
    SCALES1 = [(96, 266), (102, 266), (109, 266), (115, 266),
               (122, 266), (128, 266), (134, 266), (141, 266),
               (147, 266), (154, 266), (160, 266)]
    DINO_TAIL = [
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="AutoAugment", policies=[
            [dict(type="Resize", img_scale=SCALES1,
                  multiscale_mode="value", keep_ratio=True)],
            [dict(type="Resize",
                  img_scale=[(80, 840), (100, 840), (120, 840)],
                  multiscale_mode="value", keep_ratio=True),
             dict(type="RandomCrop", crop_type="absolute_range",
                  crop_size=(76, 120), allow_negative_crop=True),
             dict(type="Resize", img_scale=SCALES1,
                  multiscale_mode="value", override=True,
                  keep_ratio=True)],
        ]),
        dict(type="Normalize"),
        dict(type="Pad", size_divisor=1),
    ]

    def _run(self, tail_cfgs, n=10, seed0=700):
        from rscotr_tpu.data.loader import collate_det_aug
        Sz = self.SRC
        host_tail = P.build_pipeline(
            [c for c in tail_cfgs if c["type"] != "Normalize"])
        planner_cfgs, norm, devkw = P.split_det_device_augment_cfg(
            tail_cfgs, src_hw=(Sz, Sz))
        assert norm is not None
        planner = P.build_pipeline(planner_cfgs)[0]
        cfg = D.DetDeviceAugmentConfig(**devkw)
        imgs = _smooth_images(b=n, size=Sz, seed=21)
        samples, hosts = [], []
        for k in range(n):
            boxes = np.array([[10, 12, 60, 80], [40, 50, 150, 140],
                              [100, 5, 130, 40]], np.float32)
            labels = np.array([1, 2, 3], np.int32)
            s = planner({"img": imgs[k].copy(),
                         "gt_bboxes": boxes.copy(),
                         "gt_labels": labels.copy(),
                         "ori_shape": (Sz, Sz, 3)},
                        np.random.Generator(np.random.PCG64(seed0 + k)))
            samples.append(s)
            h = {"img": imgs[k].copy(), "gt_bboxes": boxes.copy(),
                 "gt_labels": labels.copy()}
            rh = np.random.Generator(np.random.PCG64(seed0 + k))
            hosts.append(P.run_pipeline(host_tail, h, rh))
        batch = collate_det_aug(samples, bucket_hw=(Sz, Sz), max_gt=8)
        aug = {k[len("aug_"):]: jnp.asarray(v)
               for k, v in batch.items() if k.startswith("aug_")}
        got = np.asarray(D.det_device_augment(
            jnp.asarray(batch["img"]), aug,
            batch["out_template"].shape[1:3], cfg))
        return samples, hosts, batch, got

    @pytest.mark.parametrize("tail", ["MTL_TAIL", "DINO_TAIL"])
    def test_box_and_meta_math_bit_identical(self, tail):
        samples, hosts, _, _ = self._run(getattr(self, tail))
        for s, h in zip(samples, hosts):
            assert np.array_equal(
                np.asarray(s["gt_bboxes"], np.float32),
                np.asarray(h["gt_bboxes"], np.float32))
            assert np.array_equal(np.asarray(s["gt_labels"]),
                                  np.asarray(h["gt_labels"]))
            assert tuple(s["img_shape"][:2]) == tuple(h["img"].shape[:2])
            assert np.allclose(s.get("scale_factor", np.ones(4)),
                               h.get("scale_factor", np.ones(4)))
            assert s["flip"] == h.get("flip", False)

    @pytest.mark.parametrize("tail,mean_tol,max_tol", [
        # identity-scale resize (DIOR 800x800 under (1333,800)): exact
        ("MTL_TAIL", 1e-6, 0.0),
        # real resizes/crops: PIL uint8 fixed-point coefficient noise
        ("DINO_TAIL", 0.5, 3.0),
    ])
    def test_pixels_match_host(self, tail, mean_tol, max_tol):
        _, hosts, batch, got = self._run(getattr(self, tail), n=12)
        H, W = got.shape[1:3]
        for i, h in enumerate(hosts):
            hh, ww = h["img"].shape[:2]
            d = np.abs(got[i, :hh, :ww] - h["img"])
            assert d.mean() <= mean_tol, (i, d.mean())
            assert d.max() <= max_tol, (i, d.max())
            if hh < H:
                assert np.abs(got[i, hh:]).max() == 0
            if ww < W:
                assert np.abs(got[i, :, ww:]).max() == 0

    def test_loader_integration_and_train_step(self):
        from rscotr_tpu.data import build_dataloaders
        from rscotr_tpu.data.datasets import SyntheticDetDataset
        Sz = self.SRC
        ds = SyntheticDetDataset(length=4, img_size=Sz, num_classes=7,
                                 max_boxes=5)
        ds.pipeline_cfg = list(self.MTL_TAIL)
        ds.task = "det"
        data_cfg = {"d": {"task": "det",
                          "data": {"samples_per_gpu": 2},
                          "loader": {"det_device_augment": True,
                                     "det_bucket_hw": (Sz, Sz),
                                     "max_gt": 8}}}
        dl = build_dataloaders({"d": ds}, data_cfg, train=True,
                               num_replicas=1, rank=0,
                               num_threads=1)["d"]
        batch = next(iter(dl))
        assert batch["img"].dtype == np.uint8
        assert batch["img"].shape == (2, Sz, Sz, 3)
        assert batch["out_template"].shape == (2, Sz, Sz, 0)
        assert "aug_s2_h" in batch and batch["aug_s2_h"].min() > 0

        # det_loss_fn needs the real CDN/loss machinery — covered by the
        # tiny-config e2e (test_train_smoke + devaug config); here just
        # assert the device stage runs under jit on the batch leaves
        from rscotr_tpu.ops.device_augment import (DetDeviceAugmentConfig,
                                                   det_device_augment)
        aug = {k[len("aug_"):]: jnp.asarray(v)
               for k, v in batch.items() if k.startswith("aug_")}

        @jax.jit
        def stage(img, aug):
            return det_device_augment(
                img, aug, (Sz, Sz), DetDeviceAugmentConfig(src_hw=(Sz, Sz)))

        out = stage(jnp.asarray(batch["img"]), aug)
        assert out.shape == (2, Sz, Sz, 3)
        assert bool(jnp.isfinite(out).all())
