"""Host-side data transforms (numpy/PIL).

Capability-equivalents of the mm pipelines the reference configures
(configs/_base_/{cls,det,seg}, SURVEY.md §2.4): RandomResizedCrop,
RandAugment, RandomErasing (cls); keep-ratio Resize, RandomFlip, Pad (det);
ratio-range Resize, RandomCrop w/ cat_max_ratio, PhotoMetricDistortion (seg);
Normalize everywhere.

Each transform is ``__call__(results: dict, rng: np.random.Generator)``.
``results`` carries: img (H, W, 3 float32 RGB), optional gt_label /
gt_bboxes (N,4 xyxy) / gt_labels / gt_semantic_seg, and meta keys ori_shape,
img_shape, scale_factor, flip. Images stay NHWC; final device-side
normalization/padding can be fused on TPU, but the baseline path normalizes
on host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from rscotr_tpu.config.registry import PIPELINES

try:
    from PIL import Image, ImageEnhance, ImageOps
    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

DEFAULT_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
DEFAULT_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _to_pil(img: np.ndarray) -> "Image.Image":
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def _from_pil(im: "Image.Image") -> np.ndarray:
    return np.asarray(im, np.float32)


def _resize_img(img, hw, interpolation="bilinear"):
    order = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
             "nearest": Image.NEAREST}[interpolation]
    im = _to_pil(img).resize((hw[1], hw[0]), order)
    return _from_pil(im)


def _resize_seg(seg, hw):
    im = Image.fromarray(seg.astype(np.uint8)).resize(
        (hw[1], hw[0]), Image.NEAREST)
    return np.asarray(im, seg.dtype)


@PIPELINES.register_module(name="Normalize")
class Normalize:
    def __init__(self, mean=DEFAULT_MEAN, std=DEFAULT_STD, to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        # to_rgb is a no-op: we load RGB already (mmcv loads BGR)

    def __call__(self, results, rng=None):
        results["img"] = (results["img"] - self.mean) / self.std
        return results


@PIPELINES.register_module(name="Resize")
class Resize:
    """mmdet/mmseg-style resize.

    keep_ratio: scale so long side <= max(img_scale) and short side <=
    min(img_scale). ratio_range: sample a ratio multiplier first (seg).
    Fixed size tuple without keep_ratio: exact resize (cls test).
    """

    def __init__(self, img_scale=None, size=None, keep_ratio=True,
                 ratio_range=None, multiscale_mode="range",
                 override=False, interpolation="bilinear", backend=None):
        self.img_scale = img_scale or size
        self.keep_ratio = keep_ratio
        self.ratio_range = ratio_range
        self.multiscale_mode = multiscale_mode
        # `override` is mmdet bookkeeping for re-resizing inside AutoAugment
        # branches; our scale_factor accumulates multiplicatively, so the
        # flag is accepted for config parity and needs no behavior.
        self.interpolation = interpolation

    def draw_new_hw(self, h, w, rng):
        """(new_h, new_w) — the single source of truth for the scale
        draw + keep_ratio math, shared with the device-augment
        planners (identical rng stream)."""
        scale = self.img_scale
        if (isinstance(scale, (list, tuple)) and len(scale) and
                isinstance(scale[0], (list, tuple))):
            # multi-scale: 'value' picks one of the listed scales
            # (reference det AutoAugment, dino_4scale_r50...py:116-124)
            i = int(rng.integers(0, len(scale))) if rng is not None else 0
            scale = tuple(scale[i])
        if self.ratio_range is not None:
            lo, hi = self.ratio_range
            r = rng.uniform(lo, hi) if rng is not None else 1.0
            scale = (int(scale[0] * r), int(scale[1] * r))
        if self.keep_ratio:
            long_side, short_side = max(scale), min(scale)
            f = min(long_side / max(h, w), short_side / min(h, w))
            return (int(h * f + 0.5), int(w * f + 0.5))
        return (scale[0], scale[1]) if isinstance(scale, (tuple, list)) \
            else (scale, scale)

    def __call__(self, results, rng=None):
        img = results["img"]
        h, w = img.shape[:2]
        new_hw = self.draw_new_hw(h, w, rng)
        wf = new_hw[1] / w
        hf = new_hw[0] / h
        results["img"] = _resize_img(img, new_hw, self.interpolation)
        results["img_shape"] = results["img"].shape
        sf = np.array([wf, hf, wf, hf], np.float32)
        # cumulative across repeated resizes (AutoAugment branches)
        results["scale_factor"] = sf * results.get("scale_factor", 1.0)
        results["scale_factor"] = np.asarray(results["scale_factor"],
                                             np.float32)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] * sf
        if "gt_semantic_seg" in results:
            results["gt_semantic_seg"] = _resize_seg(
                results["gt_semantic_seg"], new_hw)
        return results


@PIPELINES.register_module(name="RandomFlip")
class RandomFlip:
    def __init__(self, prob=0.5, flip_prob=None, flip_ratio=None,
                 direction="horizontal"):
        self.prob = flip_prob if flip_prob is not None else \
            (flip_ratio if flip_ratio is not None else prob)
        self.direction = direction

    def __call__(self, results, rng=None):
        do = rng.uniform() < self.prob if (rng is not None and
                                           self.prob) else False
        results["flip"] = bool(do)
        results["flip_direction"] = self.direction
        if not do:
            return results
        img = results["img"]
        if self.direction == "horizontal":
            results["img"] = img[:, ::-1].copy()
            if "gt_bboxes" in results and len(results["gt_bboxes"]):
                w = img.shape[1]
                b = results["gt_bboxes"].copy()
                b[:, [0, 2]] = w - results["gt_bboxes"][:, [2, 0]]
                results["gt_bboxes"] = b
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = \
                    results["gt_semantic_seg"][:, ::-1].copy()
        else:
            results["img"] = img[::-1].copy()
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = \
                    results["gt_semantic_seg"][::-1].copy()
        return results


@PIPELINES.register_module(name="Pad")
class Pad:
    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def __call__(self, results, rng=None):
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th, tw = ((h + d - 1) // d) * d, ((w + d - 1) // d) * d
        pad_h, pad_w = max(th - h, 0), max(tw - w, 0)
        results["img"] = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                                constant_values=self.pad_val)
        results["pad_shape"] = results["img"].shape
        if "gt_semantic_seg" in results:
            results["gt_semantic_seg"] = np.pad(
                results["gt_semantic_seg"], ((0, pad_h), (0, pad_w)),
                constant_values=self.seg_pad_val)
        return results


@PIPELINES.register_module(name="RandomResizedCrop")
class RandomResizedCrop:
    def __init__(self, size=224, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 interpolation="bicubic", backend=None):
        self.size = size if isinstance(size, (tuple, list)) else (size, size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation

    def draw_box(self, h, w, rng):
        """(y, x, ch, cw) — the single source of truth for the crop
        distribution, shared with DeviceAugmentPlanner."""
        area = h * w
        for _ in range(10):
            target_area = rng.uniform(*self.scale) * area
            ar = np.exp(rng.uniform(np.log(self.ratio[0]),
                                    np.log(self.ratio[1])))
            cw = int(round(np.sqrt(target_area * ar)))
            ch = int(round(np.sqrt(target_area / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                y = int(rng.integers(0, h - ch + 1))
                x = int(rng.integers(0, w - cw + 1))
                return y, x, ch, cw
        s = min(h, w)                       # fallback: center crop
        return (h - s) // 2, (w - s) // 2, s, s

    def __call__(self, results, rng):
        img = results["img"]
        y, x, ch, cw = self.draw_box(*img.shape[:2], rng)
        results["img"] = _resize_img(img[y:y + ch, x:x + cw], self.size,
                                     self.interpolation)
        results["img_shape"] = results["img"].shape
        return results


@PIPELINES.register_module(name="RandomCrop")
class RandomCrop:
    """Random crop; mmseg semantics (fixed crop_size + cat_max_ratio
    re-draws) and mmdet semantics (crop_type='absolute_range' samples the
    crop size, boxes are shifted/clipped and empty ones dropped —
    reference det AutoAugment branch, dino_4scale_r50...py:127-133)."""

    def __init__(self, crop_size=(512, 512), cat_max_ratio=1.0,
                 ignore_index=255, crop_type="absolute",
                 allow_negative_crop=False):
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop

    def _crop_box(self, shape, rng):
        h, w = shape[:2]
        if self.crop_type == "absolute_range":
            lo, hi = self.crop_size
            ch = min(int(rng.integers(lo, hi + 1)), h)
            cw = min(int(rng.integers(lo, hi + 1)), w)
        else:
            ch = min(self.crop_size[0], h)
            cw = min(self.crop_size[1], w)
        y = int(rng.integers(0, h - ch + 1))
        x = int(rng.integers(0, w - cw + 1))
        return y, x, ch, cw

    def select_seg_box(self, shape, seg, rng, box):
        """cat_max_ratio redraw loop (mmseg semantics) — shared with
        SegDeviceAugmentPlanner: up to 10 redraws until no class (other
        than ignore_index) covers >= cat_max_ratio of the crop."""
        for _ in range(10):
            y, x, ch, cw = box
            crop = seg[y:y + ch, x:x + cw]
            labels, cnt = np.unique(crop, return_counts=True)
            cnt = cnt[labels != self.ignore_index]
            if len(cnt) > 1 and cnt.max() / cnt.sum() < \
                    self.cat_max_ratio:
                break
            box = self._crop_box(shape, rng)
        return box

    def _crop_bboxes(self, results, box):
        y, x, ch, cw = box
        bboxes = results.get("gt_bboxes")
        if bboxes is None or not len(bboxes):
            return True
        b = bboxes - np.array([x, y, x, y], np.float32)
        b[:, 0::2] = np.clip(b[:, 0::2], 0, cw)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, ch)
        keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
        if not keep.any() and not self.allow_negative_crop:
            return False
        results["gt_bboxes"] = b[keep]
        if "gt_labels" in results:
            results["gt_labels"] = np.asarray(results["gt_labels"])[keep]
        return True

    def __call__(self, results, rng):
        img = results["img"]
        box = self._crop_box(img.shape, rng)
        if "gt_bboxes" in results:
            ok = False
            for _ in range(10):
                if self._crop_bboxes(results, box):
                    ok = True
                    break
                box = self._crop_box(img.shape, rng)
            if not ok:
                return results  # mmdet: invalid crop -> skip (uncropped)
        if self.cat_max_ratio < 1.0 and "gt_semantic_seg" in results:
            box = self.select_seg_box(img.shape, results["gt_semantic_seg"],
                                      rng, box)
        y, x, ch, cw = box
        results["img"] = img[y:y + ch, x:x + cw]
        results["img_shape"] = results["img"].shape
        if "gt_semantic_seg" in results:
            results["gt_semantic_seg"] = \
                results["gt_semantic_seg"][y:y + ch, x:x + cw]
        return results


@PIPELINES.register_module(name="PhotoMetricDistortion")
class PhotoMetricDistortion:
    """mmseg photometric distortion: brightness/contrast/saturation/hue."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def draw_params(self, rng):
        """Neutral-folded parameter record — the single source of truth
        for the draw sequence (incl. the short-circuit `or` on the HSV
        gate), shared with SegDeviceAugmentPlanner. Keys: bright (add,
        0=off), c_pre/c_post (mult, 1=off), hsv_on (the lossy uint8 HSV
        round trip happened), sat (mult), hue (add)."""
        p = dict(bright=0.0, c_pre=1.0, hsv_on=False, sat=1.0, hue=0.0,
                 c_post=1.0)
        if rng.integers(2):
            p["bright"] = float(rng.uniform(-self.brightness_delta,
                                            self.brightness_delta))
        contrast_last = bool(rng.integers(2))
        if not contrast_last and rng.integers(2):
            p["c_pre"] = float(rng.uniform(*self.contrast_range))
        if rng.integers(2) or rng.integers(2):
            p["hsv_on"] = True
            if rng.integers(2):
                p["sat"] = float(rng.uniform(*self.saturation_range))
            if rng.integers(2):
                p["hue"] = float(rng.uniform(-self.hue_delta,
                                             self.hue_delta))
        if contrast_last and rng.integers(2):
            p["c_post"] = float(rng.uniform(*self.contrast_range))
        return p

    @staticmethod
    def apply_params(img, p):
        """Host-pixel application of a draw_params record (PIL HSV)."""
        img = img.astype(np.float32) + p["bright"]
        img = img * p["c_pre"]
        if p["hsv_on"]:
            img_c = np.clip(img, 0, 255).astype(np.uint8)
            hsv = np.asarray(Image.fromarray(img_c).convert("HSV"),
                             np.float32)
            hsv[..., 1] = np.clip(hsv[..., 1] * p["sat"], 0, 255)
            hsv[..., 0] = (hsv[..., 0] + p["hue"]) % 256
            img = np.asarray(
                Image.fromarray(hsv.astype(np.uint8),
                                "HSV").convert("RGB"), np.float32)
        img = img * p["c_post"]
        return np.clip(img, 0, 255)

    def __call__(self, results, rng):
        results["img"] = self.apply_params(results["img"],
                                           self.draw_params(rng))
        return results


@PIPELINES.register_module(name="RandomErasing")
class RandomErasing:
    def __init__(self, erase_prob=0.25, mode="rand", min_area_ratio=0.02,
                 max_area_ratio=1 / 3, aspect_range=(0.3, 3.33),
                 fill_color=(128, 128, 128), fill_std=(0, 0, 0)):
        self.erase_prob = erase_prob
        self.min_area_ratio = min_area_ratio
        self.max_area_ratio = max_area_ratio
        self.aspect_range = aspect_range
        self.mode = mode
        self.fill_color = np.asarray(fill_color, np.float32)
        self.fill_std = np.asarray(fill_std, np.float32)

    def draw_box(self, h, w, rng):
        """(on, y, x, eh, ew) — shared with DeviceAugmentPlanner."""
        if rng.uniform() > self.erase_prob:
            return False, 0, 0, 0, 0
        area = h * w * rng.uniform(self.min_area_ratio, self.max_area_ratio)
        ar = np.exp(rng.uniform(np.log(self.aspect_range[0]),
                                np.log(self.aspect_range[1])))
        eh = min(int(round(np.sqrt(area / ar))), h)
        ew = min(int(round(np.sqrt(area * ar))), w)
        y = int(rng.integers(0, h - eh + 1))
        x = int(rng.integers(0, w - ew + 1))
        return True, y, x, eh, ew

    def __call__(self, results, rng):
        img = results["img"]
        on, y, x, eh, ew = self.draw_box(*img.shape[:2], rng)
        if not on:
            return results
        if self.mode == "rand":
            patch = rng.normal(size=(eh, ew, 3)) * self.fill_std + \
                self.fill_color
        else:
            patch = np.broadcast_to(self.fill_color, (eh, ew, 3))
        img[y:y + eh, x:x + ew] = np.clip(patch, 0, 255)
        results["img"] = img
        return results


# ---------------------------------------------------------------------------
# RandAugment (mmcls rand_increasing_policies equivalents on PIL)
# ---------------------------------------------------------------------------

def _ra_autocontrast(img, _):
    return _from_pil(ImageOps.autocontrast(_to_pil(img)))


def _ra_equalize(img, _):
    return _from_pil(ImageOps.equalize(_to_pil(img)))


def _ra_invert(img, _):
    return 255.0 - img


def _ra_rotate(img, m):
    return _from_pil(_to_pil(img).rotate(m * 30, Image.BICUBIC,
                                         fillcolor=(124, 116, 104)))


def _ra_posterize(img, m):
    bits = max(1, int(round(8 - m * 4)))
    return _from_pil(ImageOps.posterize(_to_pil(img), bits))


def _ra_solarize(img, m):
    thr = int(256 - m * 256)
    return _from_pil(ImageOps.solarize(_to_pil(img), thr))


def _ra_solarize_add(img, m):
    add = int(m * 110)
    out = img.copy()
    mask = out < 128
    out[mask] = np.clip(out[mask] + add, 0, 255)
    return out


def _ra_color(img, m):
    return _from_pil(ImageEnhance.Color(_to_pil(img)).enhance(1 + m))


def _ra_contrast(img, m):
    return _from_pil(ImageEnhance.Contrast(_to_pil(img)).enhance(1 + m))


def _ra_brightness(img, m):
    return _from_pil(ImageEnhance.Brightness(_to_pil(img)).enhance(1 + m))


def _ra_sharpness(img, m):
    return _from_pil(ImageEnhance.Sharpness(_to_pil(img)).enhance(1 + m))


def _ra_shear_x(img, m):
    return _from_pil(_to_pil(img).transform(
        _to_pil(img).size, Image.AFFINE, (1, m * 0.3, 0, 0, 1, 0),
        Image.BICUBIC, fillcolor=(124, 116, 104)))


def _ra_shear_y(img, m):
    return _from_pil(_to_pil(img).transform(
        _to_pil(img).size, Image.AFFINE, (1, 0, 0, m * 0.3, 1, 0),
        Image.BICUBIC, fillcolor=(124, 116, 104)))


def _ra_translate_x(img, m):
    dx = m * 0.45 * img.shape[1]
    return _from_pil(_to_pil(img).transform(
        _to_pil(img).size, Image.AFFINE, (1, 0, dx, 0, 1, 0),
        Image.BICUBIC, fillcolor=(124, 116, 104)))


def _ra_translate_y(img, m):
    dy = m * 0.45 * img.shape[0]
    return _from_pil(_to_pil(img).transform(
        _to_pil(img).size, Image.AFFINE, (1, 0, 0, 0, 1, dy),
        Image.BICUBIC, fillcolor=(124, 116, 104)))


RAND_AUG_OPS = [
    ("AutoContrast", _ra_autocontrast, False),
    ("Equalize", _ra_equalize, False),
    ("Invert", _ra_invert, False),
    ("Rotate", _ra_rotate, True),
    ("Posterize", _ra_posterize, False),
    ("Solarize", _ra_solarize, False),
    ("SolarizeAdd", _ra_solarize_add, False),
    ("ColorTransform", _ra_color, True),
    ("Contrast", _ra_contrast, True),
    ("Brightness", _ra_brightness, True),
    ("Sharpness", _ra_sharpness, True),
    ("Shear", _ra_shear_x, True),
    ("ShearY", _ra_shear_y, True),
    ("Translate", _ra_translate_x, True),
    ("TranslateY", _ra_translate_y, True),
]


@PIPELINES.register_module(name="RandAugment")
class RandAugment:
    """num_policies random ops at magnitude_level/total_level (+noise).

    ``policies``: optional explicit policy list as in the reference's
    ``configs/_base_/cls/rand_aug.py`` (mmcls rand_increasing_policies —
    dicts with ``type`` and optional ``direction``); the op pool is
    filtered/ordered by it. ``None`` keeps the full built-in table.
    ``magnitude_key``/``magnitude_range`` entries are accepted for config
    compatibility; our ops already encode the same increasing-magnitude
    ranges internally."""

    _DIRECTED = {("Shear", "horizontal"): "Shear",
                 ("Shear", "vertical"): "ShearY",
                 ("Translate", "horizontal"): "Translate",
                 ("Translate", "vertical"): "TranslateY"}

    def __init__(self, policies=None, num_policies=2, total_level=10,
                 magnitude_level=9, magnitude_std=0.5, hparams=None):
        self.num_policies = num_policies
        self.total_level = total_level
        self.magnitude_level = magnitude_level
        self.magnitude_std = magnitude_std
        self.ops = RAND_AUG_OPS
        if policies is not None:
            table = {name: (name, fn, signed)
                     for name, fn, signed in RAND_AUG_OPS}
            self.ops = []
            for p in policies:
                t = p["type"] if isinstance(p, dict) else str(p)
                d = p.get("direction") if isinstance(p, dict) else None
                name = self._DIRECTED.get((t, d), t)
                if name not in table:
                    raise KeyError(f"unknown RandAugment policy {t!r}")
                self.ops.append(table[name])

    def draw_ops(self, rng):
        """[(op_index_into_self.ops, signed_magnitude)] * num_policies —
        shared with DeviceAugmentPlanner."""
        out = []
        for _ in range(self.num_policies):
            i = int(rng.integers(0, len(self.ops)))
            signed = self.ops[i][2]
            mag = self.magnitude_level
            if self.magnitude_std > 0:
                mag = rng.normal(mag, self.magnitude_std)
            m = float(np.clip(mag, 0, self.total_level)) / self.total_level
            if signed and rng.integers(2):
                m = -m
            out.append((i, m))
        return out

    def __call__(self, results, rng):
        img = results["img"]
        for i, m in self.draw_ops(rng):
            img = self.ops[i][1](img, m)
        results["img"] = img
        return results


@PIPELINES.register_module(name="LoadImageFromFile")
class LoadImageFromFile:
    """Decodes via the native C++ core (csrc/image_core.cpp — libjpeg/
    libpng, GIL released, so loader threads decode in parallel) with a
    PIL fallback; the reference decodes through cv2/turbojpeg inside the
    mm pipelines. RSCOTR_NO_NATIVE_IMDECODE=1 forces the PIL path.

    Pass-through when the sample already carries a decoded ``img`` and no
    ``img_path`` (eagerly-loading datasets, inference_one_img's raw-image
    inputs — the reference strips this op from those pipelines instead,
    tools/inference_one_img.py:267-290)."""

    def __call__(self, results, rng=None):
        path = results.get("img_path")
        if path is None:
            if "img" not in results:
                raise KeyError("LoadImageFromFile: sample has neither "
                               "'img_path' nor a decoded 'img'")
            return results
        from rscotr_tpu.data.native_image import imread
        arr = imread(path)
        if arr is None:
            arr = np.asarray(Image.open(path).convert("RGB"))
        results["img"] = arr.astype(np.float32)
        results["ori_shape"] = results["img"].shape
        results["img_shape"] = results["img"].shape
        return results


@PIPELINES.register_module(name="AutoAugment")
class AutoAugment:
    """mmdet AutoAugment: pick ONE policy branch uniformly and run its
    transforms (reference det train pipeline,
    dino_4scale_r50_1x1_50e_dior.py:113-150)."""

    def __init__(self, policies):
        self.policies = [build_pipeline(p) for p in policies]

    def __call__(self, results, rng):
        i = int(rng.integers(0, len(self.policies))) if rng is not None \
            else 0
        return run_pipeline(self.policies[i], results, rng)


@PIPELINES.register_module(name="DeviceAugmentPlanner")
class DeviceAugmentPlanner:
    """Parameter-only twin of the cls train augment tail.

    Replaces [RandomResizedCrop, RandomFlip, RandAugment, RandomErasing,
    Normalize] when ``loader.cls_device_augment`` is set: instead of doing
    the per-image pixel work on the host (measured 25 ms/img, PERF.md),
    it draws the SAME random parameters (via the original ops' shared
    ``draw_box``/``draw_ops`` methods — single source of truth for the
    distributions) and ships the raw uint8 image + tiny ``aug_*`` records;
    ``ops/device_augment.cls_device_augment`` executes the pixel work
    batched on TPU inside the jitted train step."""

    def __init__(self, rrc=None, flip=None, rand_aug=None, erase=None,
                 src_size=256):
        from rscotr_tpu.ops.device_augment import RAND_AUG_OP_NAMES
        self.src_size = src_size
        self.rrc = RandomResizedCrop(**(rrc or {}))
        fl = dict(flip or {})
        self.flip_prob = fl.get("flip_prob", fl.get("prob", 0.5))
        assert fl.get("direction", "horizontal") == "horizontal"
        self.rand_aug = RandAugment(**(rand_aug or {}))
        # map the (possibly policy-filtered/ordered) op pool to canonical
        # device op ids
        self.op_canon = np.asarray(
            [RAND_AUG_OP_NAMES.index(name)
             for name, _, _ in self.rand_aug.ops], np.int32)
        self.erase = RandomErasing(**(erase or {}))
        assert self.erase.mode in ("rand", "const")

    def __call__(self, results, rng):
        img = results["img"]
        h, w = img.shape[:2]
        if (h, w) != (self.src_size, self.src_size):
            # static device shapes need a fixed source size; RESISC is
            # uniformly 256x256 so this is a safety net, not the hot path
            img = _resize_img(img, (self.src_size, self.src_size),
                              "bicubic")
            h = w = self.src_size
        results["img"] = np.clip(np.round(img), 0, 255).astype(np.uint8)
        y, x, ch, cw = self.rrc.draw_box(h, w, rng)
        results["aug_crop_y"] = np.int32(y)
        results["aug_crop_x"] = np.int32(x)
        results["aug_crop_h"] = np.int32(ch)
        results["aug_crop_w"] = np.int32(cw)
        results["aug_flip"] = bool(
            rng.uniform() < self.flip_prob if self.flip_prob else False)
        ops = self.rand_aug.draw_ops(rng)
        results["aug_op_id"] = np.asarray(
            [self.op_canon[i] for i, _ in ops], np.int32)
        results["aug_op_m"] = np.asarray([m for _, m in ops], np.float32)
        oh, ow = self.rrc.size
        on, ey, ex, eh, ew = self.erase.draw_box(oh, ow, rng)
        results["aug_erase_on"] = bool(on)
        results["aug_erase_y"] = np.int32(ey)
        results["aug_erase_x"] = np.int32(ex)
        results["aug_erase_h"] = np.int32(eh)
        results["aug_erase_w"] = np.int32(ew)
        return results


@PIPELINES.register_module(name="SegDeviceAugmentPlanner")
class SegDeviceAugmentPlanner:
    """Parameter-only twin of the seg train augment tail.

    Replaces [Resize(ratio_range), RandomCrop, RandomFlip,
    PhotoMetricDistortion, Normalize, Pad] when
    ``loader.seg_device_augment`` is set: the host draws the SAME random
    parameters (via the ops' shared ``draw_new_hw``/``_crop_box``/
    ``select_seg_box``/``draw_params`` methods) and fully processes the
    LABEL (nearest resize + crop + flip + pad — index work, cheap); the
    image ships as raw uint8 with tiny ``aug_*`` records and
    ``ops/device_augment.seg_device_augment`` does the pixel work
    batched inside the jitted seg train step. The cat_max_ratio redraw
    loop needs the resized label, which is why the label stays host-side
    (the reference runs it on the label too —
    /root/reference/configs/_base_/seg/potsdam_IRRG_all.py:13)."""

    def __init__(self, resize=None, crop=None, flip=None,
                 photometric=None, pad=None, src_size=512):
        self.src_size = src_size
        self.resize = Resize(**(resize or {}))
        self.crop = RandomCrop(**(crop or {}))
        fl = dict(flip or {})
        self.flip_prob = fl.get("prob", fl.get("flip_prob",
                                               fl.get("flip_ratio", 0.5)))
        assert fl.get("direction", "horizontal") == "horizontal"
        self.pm = PhotoMetricDistortion(**(photometric or {}))
        pd = dict(pad or {})
        ps = pd.get("size", (src_size, src_size))
        self.pad_size = tuple(ps)
        self.seg_pad_val = pd.get("seg_pad_val", 255)
        cs = tuple(self.crop.crop_size)
        assert self.pad_size == cs, (
            f"seg_device_augment needs Pad size {self.pad_size} == "
            f"crop_size {cs} (static device output)")

    def __call__(self, results, rng):
        img = results["img"]
        h, w = img.shape[:2]
        if (h, w) != (self.src_size, self.src_size):
            # static device shapes need a fixed source size; Potsdam
            # tiles are uniformly 512x512 so this is a safety net
            img = _resize_img(img, (self.src_size, self.src_size),
                              "bilinear")
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = _resize_seg(
                    results["gt_semantic_seg"],
                    (self.src_size, self.src_size))
            h = w = self.src_size
        results["img"] = np.clip(np.round(img), 0, 255).astype(np.uint8)
        seg = results.get("gt_semantic_seg")

        new_hw = self.resize.draw_new_hw(h, w, rng)
        seg_r = _resize_seg(seg, new_hw) if seg is not None else None
        sf = np.array([new_hw[1] / w, new_hw[0] / h,
                       new_hw[1] / w, new_hw[0] / h], np.float32)
        results["scale_factor"] = np.asarray(
            sf * results.get("scale_factor", 1.0), np.float32)

        box = self.crop._crop_box((new_hw[0], new_hw[1], 3), rng)
        if self.crop.cat_max_ratio < 1.0 and seg_r is not None:
            box = self.crop.select_seg_box((new_hw[0], new_hw[1], 3),
                                           seg_r, rng, box)
        y, x, ch, cw = box
        seg_c = seg_r[y:y + ch, x:x + cw] if seg_r is not None else None

        do_flip = bool(rng.uniform() < self.flip_prob) \
            if self.flip_prob else False
        if do_flip and seg_c is not None:
            seg_c = seg_c[:, ::-1]
        p = self.pm.draw_params(rng)

        ph, pw = self.pad_size
        if seg_c is not None:
            out = np.full((ph, pw), self.seg_pad_val, seg.dtype)
            out[:ch, :cw] = seg_c
            results["gt_semantic_seg"] = out
        results["img_shape"] = (ch, cw, 3)
        results["pad_shape"] = (ph, pw, 3)
        results["aug_resize_h"] = np.int32(new_hw[0])
        results["aug_resize_w"] = np.int32(new_hw[1])
        results["aug_crop_y"] = np.int32(y)
        results["aug_crop_x"] = np.int32(x)
        results["aug_crop_h"] = np.int32(ch)
        results["aug_crop_w"] = np.int32(cw)
        results["aug_flip"] = do_flip
        results["aug_pm_bright"] = np.float32(p["bright"])
        results["aug_pm_c_pre"] = np.float32(p["c_pre"])
        results["aug_pm_hsv_on"] = bool(p["hsv_on"])
        results["aug_pm_sat"] = np.float32(p["sat"])
        results["aug_pm_hue"] = np.float32(p["hue"])
        results["aug_pm_c_post"] = np.float32(p["c_post"])
        return results


@PIPELINES.register_module(name="DetDeviceAugmentPlanner")
class DetDeviceAugmentPlanner:
    """Parameter-only twin of the det train augment tail.

    Replaces the geometric ops ([Resize, RandomFlip] in the MTL det
    pipeline; [RandomFlip, AutoAugment{[Resize] | [Resize, RandomCrop,
    Resize]}] in the single-task DINO pipeline) when
    ``loader.det_device_augment`` is set. The host walks the configured
    ops IN ORDER drawing the same rng stream (shared draw_new_hw /
    _crop_box / _crop_bboxes methods) and does all box/meta math; the
    image ships as raw uint8 + a normalized two-stage geometric program
    (resize -> crop -> resize, identity-filled) that
    ``ops/device_augment.det_device_augment`` executes batched on TPU.

    Flip handling: a RandomFlip BEFORE the first resize becomes a
    source mirror inside stage 1 (flip commutes with a full-frame
    separable resize exactly); AFTER the last resize it becomes an
    output mirror inside stage 2. A flip between two resizes is not a
    valid normalization and asserts."""

    def __init__(self, ops, src_hw=(800, 800), max_hw=None):
        self.src_hw = tuple(src_hw)
        self.max_hw = tuple(max_hw) if max_hw else self.src_hw
        self.ops = []
        for c in ops:
            c = dict(c)
            t = c.pop("type")
            if t == "Resize":
                self.ops.append(Resize(**c))
            elif t == "RandomFlip":
                self.ops.append(RandomFlip(**c))
            elif t == "AutoAugment":
                branches = []
                for pol in c["policies"]:
                    branch = []
                    for sub in pol:
                        sub = dict(sub)
                        st = sub.pop("type")
                        assert st in ("Resize", "RandomCrop"), (
                            f"det_device_augment: unsupported AutoAugment "
                            f"op {st!r}")
                        branch.append(Resize(**sub) if st == "Resize"
                                      else RandomCrop(**sub))
                    branches.append(branch)
                self.ops.append(("autoaug", branches))
            else:
                raise AssertionError(
                    f"det_device_augment: unsupported op {t!r}")

    @staticmethod
    def _flip_boxes(results, w):
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"].copy()
            b[:, [0, 2]] = w - results["gt_bboxes"][:, [2, 0]]
            results["gt_bboxes"] = b

    @staticmethod
    def _scale_boxes(results, sf):
        results["scale_factor"] = np.asarray(
            sf * results.get("scale_factor", 1.0), np.float32)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] * sf

    def _walk(self, ops, results, rng, hw, prog):
        """Replicate the host ops' draw order + box math, recording the
        geometric program. Returns the current (h, w)."""
        h, w = hw
        for op in ops:
            if isinstance(op, RandomFlip):
                do = bool(rng.uniform() < op.prob) if op.prob else False
                assert op.direction == "horizontal"
                results["flip"] = do
                if do:
                    self._flip_boxes(results, w)
                    if not prog["stages"]:
                        prog["flip_src"] = not prog["flip_src"]
                    else:
                        assert prog["n_resize"] == len(prog["stages"]), \
                            "flip between resizes is unsupported"
                        prog["flip_out"] = not prog.get("flip_out", False)
            elif isinstance(op, Resize):
                new_hw = op.draw_new_hw(h, w, rng)
                sf = np.array([new_hw[1] / w, new_hw[0] / h,
                               new_hw[1] / w, new_hw[0] / h], np.float32)
                self._scale_boxes(results, sf)
                assert not prog.get("flip_out"), \
                    "flip between resizes is unsupported"
                prog["stages"].append(("resize", new_hw))
                prog["n_resize"] = prog.get("n_resize", 0) + 1
                h, w = new_hw
            elif isinstance(op, RandomCrop):
                # mirror of RandomCrop.__call__ for the det/bbox path
                box = op._crop_box((h, w, 3), rng)
                ok = True
                if "gt_bboxes" in results:
                    ok = False
                    for _ in range(10):
                        if op._crop_bboxes(results, box):
                            ok = True
                            break
                        box = op._crop_box((h, w, 3), rng)
                if ok:
                    y, x, ch, cw = box
                    prog["stages"].append(("crop", (y, x, ch, cw)))
                    h, w = ch, cw
            elif isinstance(op, tuple) and op[0] == "autoaug":
                branches = op[1]
                i = int(rng.integers(0, len(branches)))
                h, w = self._walk(branches[i], results, rng, (h, w), prog)
            else:  # pragma: no cover
                raise AssertionError(op)
        return h, w

    def __call__(self, results, rng):
        img = results["img"]
        h0, w0 = img.shape[:2]
        sh, sw = self.src_hw
        assert h0 <= sh and w0 <= sw, (
            f"source image {h0}x{w0} exceeds det_src_hw {self.src_hw}")
        src = np.zeros((sh, sw, 3), np.uint8)
        src[:h0, :w0] = np.clip(np.round(img), 0, 255).astype(np.uint8)
        results["img"] = src

        prog = {"stages": [], "flip_src": False, "flip_out": False,
                "n_resize": 0}
        results.setdefault("flip", False)
        h, w = self._walk(self.ops, results, rng, (h0, w0), prog)

        # normalize to the two-stage program: R -> C -> R
        s1 = crop = s2 = None
        for kind, val in prog["stages"]:
            if kind == "resize":
                if s1 is None:
                    s1 = val
                elif s2 is None:
                    s2 = val
                else:
                    raise AssertionError(
                        "det_device_augment supports at most 2 resizes")
            else:
                assert s1 is not None and crop is None and s2 is None, \
                    "det_device_augment supports one crop between resizes"
                crop = val
        if s1 is None:
            s1 = (h0, w0)
        if crop is None:
            crop = (0, 0, s1[0], s1[1])
        if s2 is None:
            s2 = (crop[2], crop[3])
        assert s1[0] <= self.src_hw[0] and s1[1] <= self.src_hw[1], (
            f"stage-1 size {s1} exceeds the mid buffer {self.src_hw}; "
            "raise loader.det_src_hw")
        assert (h, w) == s2

        results["img_shape"] = (h, w, 3)
        results["aug_src_h"] = np.int32(h0)
        results["aug_src_w"] = np.int32(w0)
        results["aug_flip_src"] = bool(prog["flip_src"])
        results["aug_flip_out"] = bool(prog["flip_out"])
        results["aug_s1_h"] = np.int32(s1[0])
        results["aug_s1_w"] = np.int32(s1[1])
        results["aug_crop_y"] = np.int32(crop[0])
        results["aug_crop_x"] = np.int32(crop[1])
        results["aug_crop_h"] = np.int32(crop[2])
        results["aug_crop_w"] = np.int32(crop[3])
        results["aug_s2_h"] = np.int32(s2[0])
        results["aug_s2_w"] = np.int32(s2[1])
        return results


def split_det_device_augment_cfg(cfgs: Sequence[dict],
                                 src_hw=(800, 800)):
    """Rewrite a det train pipeline for device-side augmentation: the
    geometric tail becomes one DetDeviceAugmentPlanner cfg; Normalize
    moves to the device; Pad must be a no-op (size_divisor<=1 — the
    static bucket pad replaces it, as in the host path). Returns
    (new_cfgs, img_norm, det_device_aug_cfg_kwargs)."""
    head, tail, norm = [], [], None
    for c in cfgs:
        t = c.get("type")
        if t in ("Resize", "RandomFlip", "AutoAugment"):
            tail.append(dict(c))
        elif t == "Normalize":
            norm = {"mean": list(c.get("mean", DEFAULT_MEAN)),
                    "std": list(c.get("std", DEFAULT_STD))}
        elif t == "Pad":
            assert c.get("size_divisor", 1) <= 1 and not c.get("size"), (
                "det_device_augment: Pad beyond the static bucket is "
                "unsupported (reference det configs use size_divisor=1)")
        else:
            assert not tail, (
                f"op {t!r} after the geometric tail started — det device "
                "augment supports the reference det pipeline orders")
            head.append(c)
    assert tail, "det_device_augment found no geometric ops"
    planner_cfg = dict(type="DetDeviceAugmentPlanner", ops=tail,
                       src_hw=tuple(src_hw))
    dev_cfg = dict(src_hw=tuple(src_hw))
    return head + [planner_cfg], norm, dev_cfg


def split_seg_device_augment_cfg(cfgs: Sequence[dict],
                                 src_size: int = 512):
    """Rewrite a seg train pipeline for device-side augmentation: the
    augment tail becomes one SegDeviceAugmentPlanner cfg; Normalize
    moves to the device. Returns (new_cfgs, img_norm,
    seg_device_aug_cfg_kwargs) — the kwargs feed
    ops/device_augment.SegDeviceAugmentConfig."""
    head, parts, norm = [], {}, None
    keymap = {"Resize": "resize", "RandomCrop": "crop",
              "RandomFlip": "flip", "PhotoMetricDistortion": "photometric",
              "Pad": "pad"}
    for c in cfgs:
        t = c.get("type")
        if t in keymap:
            parts[keymap[t]] = {k: v for k, v in c.items() if k != "type"}
        elif t == "Normalize":
            norm = {"mean": list(c.get("mean", DEFAULT_MEAN)),
                    "std": list(c.get("std", DEFAULT_STD))}
        else:
            assert not parts, (
                f"op {t!r} after the augment tail started — seg device "
                "augment supports the reference seg pipeline order")
            head.append(c)
    assert "crop" in parts, "seg_device_augment needs a RandomCrop"
    planner_cfg = dict(type="SegDeviceAugmentPlanner", src_size=src_size,
                       **parts)
    crop_size = parts["crop"].get("crop_size", (512, 512))
    assert crop_size[0] == crop_size[1], (
        "seg_device_augment supports square crop_size only")
    dev_cfg = dict(src_size=src_size, out_size=int(crop_size[0]))
    return head + [planner_cfg], norm, dev_cfg


def split_device_augment_cfg(cfgs: Sequence[dict], src_size: int = 256):
    """Rewrite a cls train pipeline for device-side augmentation: the
    augment tail becomes one DeviceAugmentPlanner cfg; Normalize moves to
    the device (returned as ``img_norm``). Returns
    (new_cfgs, img_norm, device_aug_cfg_kwargs) — device_aug_cfg_kwargs
    feeds ops/device_augment.DeviceAugmentConfig."""
    head, parts, norm = [], {}, None
    keymap = {"RandomResizedCrop": "rrc", "RandomFlip": "flip",
              "RandAugment": "rand_aug", "RandomErasing": "erase"}
    for c in cfgs:
        t = c.get("type")
        if t in keymap:
            parts[keymap[t]] = {k: v for k, v in c.items() if k != "type"}
        elif t == "Normalize":
            norm = {"mean": list(c.get("mean", DEFAULT_MEAN)),
                    "std": list(c.get("std", DEFAULT_STD))}
        else:
            assert not parts, (
                f"op {t!r} after the augment tail started — device "
                "augment supports the reference cls pipeline order")
            head.append(c)
    assert "rrc" in parts, "cls_device_augment needs a RandomResizedCrop"
    planner_cfg = dict(type="DeviceAugmentPlanner", src_size=src_size,
                       **parts)
    rrc_size = parts["rrc"].get("size", 224)
    erase = parts.get("erase", {})
    dev_cfg = dict(
        src_size=src_size,
        out_size=rrc_size if isinstance(rrc_size, int) else rrc_size[0],
        erase_fill=tuple(erase.get("fill_color", (128, 128, 128))),
        erase_fill_std=tuple(erase.get("fill_std", (0, 0, 0))),
        num_policies=int(parts.get("rand_aug", {}).get(
            "num_policies", 2)))
    return head + [planner_cfg], norm, dev_cfg


def split_normalize_cfg(cfgs: Sequence[dict]):
    """Remove the Normalize op from a pipeline config, returning
    (cfgs_without_normalize, norm_cfg_or_None). Used by device-side
    preprocessing: images stay uint8 through the host pipeline and H2D
    transfer; normalization runs on TPU inside the jitted step (SURVEY.md
    §2b cv2/PIL row north star; cuts image transfer bytes 4x)."""
    out, norm = [], None
    for c in cfgs:
        if c.get("type") == "Normalize":
            norm = {"mean": list(c.get("mean", DEFAULT_MEAN)),
                    "std": list(c.get("std", DEFAULT_STD))}
        else:
            out.append(c)
    return out, norm


def build_pipeline(cfgs: Sequence[dict]) -> List:
    """Build a transform list from reference-shaped pipeline configs,
    skipping torch-format bundling steps (we batch numpy directly).
    LoadImageFromFile is KEPT: datasets that index real files emit
    ``img_path`` and rely on it (it passes through samples that already
    carry a decoded ``img``)."""
    skip = {"LoadAnnotations", "DefaultFormatBundle",
            "ImageToTensor", "ToTensor", "Collect", "MultiScaleFlipAug"}
    out = []
    for c in cfgs:
        c = dict(c)
        t = c.pop("type")
        if t in skip:
            if t == "MultiScaleFlipAug":
                out.extend(build_pipeline(c.get("transforms", [])))
            continue
        out.append(PIPELINES.build({"type": t, **c}))
    return out


def run_pipeline(transforms, results, rng):
    for t in transforms:
        results = t(results, rng)
    return results
