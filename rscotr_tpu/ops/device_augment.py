"""On-device (jitted, batched) cls train augmentations.

Kills the measured host input bottleneck (PERF.md 2026-08-19: cls host
prep ~25 ms/img x 16 = 0.4 s/iter vs a 0.110 s/iter device mix): the
pixel work of the reference cls train pipeline — RandomResizedCrop,
RandomFlip, RandAugment (all 15 mmcls rand_increasing policies),
RandomErasing (reference /root/reference/configs/_base_/cls/
resisc_swin_224.py + rand_aug.py) — runs as ONE jitted batch stage on
TPU. The host only *draws the random parameters* (tiny per-sample
records, data/pipelines.py DeviceAugmentPlanner) with the same
distributions as the host pipeline ops, so augmentation semantics are
unchanged; tests/test_device_augment.py checks each op against the
host/PIL implementation on identical parameters.

TPU-native formulation (no per-pixel gathers — the XLA gather cost model
on this platform is ~7 ns per looked-up row, so 224*224*16-tap warps
would cost ms/img):

* RandomResizedCrop: PIL's antialiased bicubic resize is a pair of
  per-image dense interpolation matrices (out x src) built from the crop
  box with vectorized elementwise ops, applied as two batched matmuls —
  MXU work, exact PIL weight formula (support scaled by the minification
  factor, window clipped to the crop, renormalized).
* Geometric RandAugment ops (Rotate / Shear x,y / Translate x,y) share
  ONE generalized three-pass shear warp (rotation = shear_x o shear_y o
  shear_x, Paeth decomposition; shears/translates use a single pass).
  Each pass resamples rows (or columns) by a PER-ROW CONSTANT fractional
  shift: a vmapped ``lax.dynamic_slice`` (one looked-up row per image
  row — B*H lookups, microseconds under the gather cost model) plus a
  4-tap cubic mix on the VPU.
* Pointwise ops (AutoContrast, Equalize, Invert, Posterize, Solarize,
  SolarizeAdd, Color, Contrast, Brightness, Sharpness) follow PIL's
  integer semantics (uint8 rounding at op boundaries, integer L
  conversion, histogram LUTs via one-hot matmuls).
* Per-image op dispatch is compute-all-and-select: every image pays one
  warp + all pointwise candidates per policy slot; the pointwise set is
  a few elementwise passes over the batch, far below one model fwd/bwd.

All shapes static; everything differentiability-free (input pipeline).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST

# canonical op table order — mirrors data/pipelines.py RAND_AUG_OPS
RAND_AUG_OP_NAMES = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
    "Solarize", "SolarizeAdd", "ColorTransform", "Contrast", "Brightness",
    "Sharpness", "Shear", "ShearY", "Translate", "TranslateY",
)
_GEOM = {"Rotate": 3, "Shear": 11, "ShearY": 12, "Translate": 13,
         "TranslateY": 14}


@dataclasses.dataclass(frozen=True)
class DeviceAugmentConfig:
    src_size: int = 256                 # decoded image size (RESISC: 256)
    out_size: int = 224
    fill: Tuple[float, float, float] = (124.0, 116.0, 104.0)   # RGB
    erase_fill: Tuple[float, float, float] = (104.0, 116.0, 124.0)
    erase_fill_std: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    num_policies: int = 2


# ---------------------------------------------------------------------------
# cubic kernels
# ---------------------------------------------------------------------------

def _cubic(x, a=-0.5):
    """PIL/OpenCV bicubic kernel (a = -0.5), support 2."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w1 = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    w2 = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax < 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _triangle(x):
    """PIL BILINEAR kernel, support 1."""
    return jnp.maximum(1.0 - jnp.abs(x), 0.0)


_KERNELS = {"bicubic": _cubic, "bilinear": _triangle}


def pil_resample_matrix(n_rows: int, src_size: int, win_start, win_size,
                        row0, out_len, n_valid, kernel: str = "bicubic",
                        mirror_out=None, mirror_src=None, src_len=None):
    """(B, n_rows, src_size) PIL ``Image.resize`` weight rows — the
    general separable-resize-as-matmul builder behind every device
    augment stage (one axis; apply twice for 2-D).

    Emits output rows [row0, row0+n_rows) of PIL's antialiased resize of
    the half-open source window [win_start, win_start+win_size) to
    ``out_len`` rows. All window parameters are per-image (B,) arrays;
    everything is built from elementwise/broadcast ops (no gathers).

    PIL semantics: scale = win_size/out_len; filterscale = max(scale, 1);
    center_i = win_start + (row0+i+0.5)*scale; taps j weighted
    kernel((j+0.5-center)/filterscale), window clipped to the source
    window and renormalized.

    Uses beyond a plain resize:
    * crop-then-resize (cls RandomResizedCrop): win = crop box, row0=0.
    * resize-then-crop (seg ratio-resize + RandomCrop): win = full valid
      source, row0 = crop origin IN RESIZED COORDS, n_valid = crop len —
      computing only the cropped rows of the resized image is exactly
      PIL-resize-everything-then-slice.
    * ``n_valid`` zeroes rows >= it (static out shape, per-image valid
      length; pair with downstream masking).
    * ``mirror_out`` (B,) bool: horizontal-flip AFTER this stage folded
      into the matrix — row i reads resized row n_valid-1-i. Exact
      (no resampling cost; PIL flip is a pure permutation).
    * ``mirror_src`` (B,) bool: flip BEFORE this stage — taps evaluated
      against the mirrored source of valid length ``src_len``
      (defaults to win_start+win_size).
    """
    f32 = jnp.float32
    win_start = jnp.asarray(win_start, f32)
    win_size = jnp.asarray(win_size, f32)
    row0 = jnp.asarray(row0, f32)
    out_len = jnp.asarray(out_len, f32)
    n_valid_f = jnp.asarray(n_valid, f32)
    scale = win_size / jnp.maximum(out_len, 1.0)              # (B,)
    fscale = jnp.maximum(scale, 1.0)
    i = jnp.arange(n_rows, dtype=f32)[None, :]                # (1, R)
    if mirror_out is not None:
        i = jnp.where(jnp.asarray(mirror_out)[:, None],
                      n_valid_f[:, None] - 1.0 - i, i)        # (B, R)
    center = win_start[:, None] + (row0[:, None] + i + 0.5) * \
        scale[:, None]                                        # (B, R)
    j = jnp.arange(src_size, dtype=f32)                       # (S,)
    pos = j[None, None, :]                                    # tap coord
    if mirror_src is not None:
        sl = jnp.asarray(win_start + win_size if src_len is None
                         else src_len, f32)
        mpos = sl[:, None, None] - 1.0 - j[None, None, :]
        pos = jnp.where(jnp.asarray(mirror_src)[:, None, None],
                        mpos, pos)
    x = (pos + 0.5 - center[:, :, None]) / fscale[:, None, None]
    w = _KERNELS[kernel](x)                                   # (B, R, S)
    inside = (pos >= win_start[:, None, None]) & \
        (pos < (win_start + win_size)[:, None, None])
    w = jnp.where(inside, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)
    valid_row = jnp.arange(n_rows, dtype=f32)[None, :] < \
        n_valid_f[:, None]                                    # (B, R)
    return jnp.where(valid_row[:, :, None], w, 0.0)


def apply_resample(img, my, mx):
    """out = my @ img @ mx^T per image/channel (f32-precision MXU work;
    bf16-class default would cost ~1 gray level on 512-tap rows)."""
    out = jnp.einsum("bys,bswc->bywc", my, img, precision=_HIGHEST)
    return jnp.einsum("bxw,bywc->byxc", mx, out, precision=_HIGHEST)


# ---------------------------------------------------------------------------
# RandomResizedCrop: per-image PIL-antialias bicubic resize matrices
# ---------------------------------------------------------------------------

def _pil_resize_matrix(out_size: int, src_size: int, start, size):
    """(B, out, src) PIL ``Image.resize(BICUBIC)`` weight rows for
    resizing the half-open crop [start, start+size) to out_size.

    PIL semantics: scale = size/out; filterscale = max(scale, 1);
    center_i = start + (i+0.5)*scale; taps j weighted
    cubic((j+0.5-center)/filterscale), window clipped to the crop and
    renormalized. Built with pure elementwise/broadcast ops from the
    per-image (start, size) scalars."""
    B = start.shape[0]
    start = start.astype(jnp.float32)
    size = size.astype(jnp.float32)
    scale = size / out_size                                    # (B,)
    fscale = jnp.maximum(scale, 1.0)
    i = jnp.arange(out_size, dtype=jnp.float32)                # (out,)
    center = start[:, None] + (i[None, :] + 0.5) * scale[:, None]
    j = jnp.arange(src_size, dtype=jnp.float32)                # (src,)
    x = (j[None, None, :] + 0.5 - center[:, :, None]) / \
        fscale[:, None, None]                                  # (B,out,src)
    w = _cubic(x)
    # clip the window to the crop box (PIL clips taps to the image)
    inside = (j[None, None, :] >= start[:, None, None]) & \
        (j[None, None, :] < (start + size)[:, None, None])
    w = jnp.where(inside, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)


def random_resized_crop(img, crop_y, crop_x, crop_h, crop_w,
                        out_size: int):
    """Batched PIL-equivalent ``img.crop(box).resize(out, BICUBIC)``.

    img: (B, S, S, 3) float 0..255. Crop params: (B,) int32."""
    S = img.shape[1]
    my = _pil_resize_matrix(out_size, S, crop_y, crop_h)       # (B,out,S)
    mx = _pil_resize_matrix(out_size, S, crop_x, crop_w)
    out = jnp.einsum("bys,bswc->bywc", my, img)                # vertical
    out = jnp.einsum("bxw,bywc->byxc", mx, out)                # horizontal
    # PIL rounds to uint8 after resize
    return jnp.clip(jnp.round(out), 0.0, 255.0)


# ---------------------------------------------------------------------------
# generalized 3-pass shear warp (rotate / shear / translate)
# ---------------------------------------------------------------------------

def _shift_rows(img, shift, fill, pad: int):
    """Resample each row by a per-row constant fractional shift:
    out[b, y, x] = in[b, y, x + shift[b, y]] (4-tap cubic, fill outside).

    img: (B, H, W, C); shift: (B, H) float32. One vmapped dynamic_slice
    per row — B*H looked-up rows, no per-pixel gather."""
    B, H, W, C = img.shape
    fill_row = jnp.broadcast_to(jnp.asarray(fill, img.dtype),
                                (B, H, pad, C))
    padded = jnp.concatenate([fill_row, img, fill_row], axis=2)
    i0 = jnp.floor(shift).astype(jnp.int32)                    # (B, H)
    frac = shift - i0
    start = jnp.clip(i0 + pad - 1, 0, 2 * pad + W - (W + 4))
    rows = padded.reshape(B * H, W + 2 * pad, C)
    starts = start.reshape(B * H)

    sl = jax.vmap(
        lambda r, s: jax.lax.dynamic_slice(r, (s, 0), (W + 4, C)))(
            rows, starts)                                      # (BH, W+4, C)
    sl = sl.reshape(B, H, W + 4, C)
    f = frac[:, :, None]                                       # (B, H, 1)
    out = jnp.zeros((B, H, W, C), img.dtype)
    for k in range(4):
        # PIL's GEOMETRY bicubic (transform/rotate) is a = -1.0 — unlike
        # its resize bicubic (a = -0.5); pinned by a delta-image probe
        # against Pillow 12 (tests/test_device_augment.py)
        w = _cubic(jnp.float32(k - 1) - f, a=-1.0)             # (B, H, 1)
        out = out + w[..., None] * sl[:, :, k:k + W, :]
    return out


def _warp_pass_x(img, k, t, fill, pad, cy):
    """Horizontal pass: src_x = x + k*(y) + t (y in raw pixel coords,
    matching PIL AFFINE's uncentered shear)."""
    B, H, W, _ = img.shape
    y = jnp.arange(H, dtype=jnp.float32)[None, :] - cy
    shift = k[:, None] * y + t[:, None]                        # (B, H)
    return _shift_rows(img, shift, fill, pad)


def _warp_pass_y(img, k, t, fill, pad, cx):
    B, H, W, _ = img.shape
    imgT = img.transpose(0, 2, 1, 3)
    out = _warp_pass_x(imgT, k, t, fill, pad, cx)
    return out.transpose(0, 2, 1, 3)


def three_pass_warp(img, k1, t1, k2, t2, k3, t3, fill,
                    cy=0.0, cx=0.0, pad: Optional[int] = None):
    """shear_x(k1, t1) -> shear_y(k2, t2) -> shear_x(k3, t3); each pass a
    per-row(-column) constant shift. Identity when all params are 0."""
    if pad is None:
        pad = img.shape[2] // 2 + 4
    out = _warp_pass_x(img, k1, t1, fill, pad, cy)
    out = _warp_pass_y(out, k2, t2, fill, pad, cx)
    out = _warp_pass_x(out, k3, t3, fill, pad, cy)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def geometric_params(op_id, m, size: int):
    """Map (canonical op id, signed magnitude) -> 3-pass warp params.

    PIL reference semantics (data/pipelines.py):
    * Rotate: ``im.rotate(m*30, BICUBIC)`` — counterclockwise about the
      center. Output->input map rotates by the SAME angle in pixel
      coords (y down): src = R(theta) @ (dst - c) + c.
      Paeth: shear_x(tan(theta/2)) o shear_y(-sin(theta)) o
      shear_x(tan(theta/2)) with centered coords.
    * Shear: transform AFFINE (1, m*0.3, 0 | 0, 1, 0): src_x = x+0.3m*y.
    * Translate: src_x = x + m*0.45*size.
    Non-geometric ids -> identity (zeros)."""
    z = jnp.zeros_like(m)
    c = (size - 1) / 2.0

    # PIL rotate(angle) is counterclockwise on screen; the spot-test in
    # tests/test_device_augment.py pins the sign convention
    theta = -m * (30.0 * np.pi / 180.0)
    tan_h = jnp.tan(theta / 2.0)
    sin_t = jnp.sin(theta)
    # centered passes: shift_x = tan_h*(y-c); shift_y = -sin_t*(x-c)
    rot = (tan_h, z, -sin_t, z, tan_h, z)

    sx = (m * 0.3, z, z, z, z, z)          # y uncentered: t covers c shift
    sy = (z, z, m * 0.3, z, z, z)
    tx = (z, m * 0.45 * size, z, z, z, z)
    ty = (z, z, z, m * 0.45 * size, z, z)

    def pick(idx):
        return (jnp.where(op_id == 3, rot[idx],
                jnp.where(op_id == 11, sx[idx],
                jnp.where(op_id == 12, sy[idx],
                jnp.where(op_id == 13, tx[idx],
                jnp.where(op_id == 14, ty[idx], z))))))

    k1, t1, k2, t2, k3, t3 = (pick(i) for i in range(6))
    # PIL's transform evaluates the affine at PIXEL CENTERS: src_x =
    # a*(x+0.5) + b*(y+0.5) + c - 0.5, so the shear shift is m*(y+0.5)
    # in raw top-left coords = k*(y-c) + k*(c+0.5) in our centered form
    t1 = t1 + jnp.where(op_id == 11, k1 * (c + 0.5), 0.0)
    t2 = t2 + jnp.where(op_id == 12, k2 * (c + 0.5), 0.0)
    return k1, t1, k2, t2, k3, t3, c


# ---------------------------------------------------------------------------
# pointwise PIL ops
# ---------------------------------------------------------------------------

def _u8(img):
    return jnp.clip(jnp.round(img), 0.0, 255.0)


def _histogram256(img_u8):
    """Per-image per-channel 256-bin histogram via a fused one-hot
    reduce (no scatter, no per-pixel gather — XLA fuses the one-hot
    generator into the sum). Returns (B, C, 256)."""
    B, H, W, C = img_u8.shape
    flat = img_u8.reshape(B, H * W, C).astype(jnp.int32)
    one = jax.nn.one_hot(flat, 256, dtype=jnp.float32)        # (B,HW,C,256)
    return one.sum(axis=1)                                    # (B, C, 256)


def op_autocontrast(img, _m):
    """PIL ImageOps.autocontrast(cutoff=0): per channel stretch min..max
    to 0..255 with PIL's TRUNCATING lut (int(ix*scale + offset));
    identity when flat."""
    x = _u8(img)
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-8)
    out = jnp.where(hi > lo, jnp.floor((x - lo) * scale + 1e-5), x)
    return jnp.clip(out, 0.0, 255.0)


def op_equalize(img, _m):
    """PIL ImageOps.equalize: per channel, step = (npix - h[last]) // 255
    where 'last' is the highest occupied bin; lut[i] = (cumsum(h)[i-1] +
    step//2) // step (identity if step == 0)."""
    x = _u8(img)
    B, H, W, C = x.shape
    h = _histogram256(x)                                       # (B, C, 256)
    idx = jnp.arange(256, dtype=jnp.float32)
    occupied = h > 0
    last_bin = jnp.max(jnp.where(occupied, idx, -1.0), axis=-1)   # (B, C)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(last_bin, 0).astype(jnp.int32)[..., None],
        axis=-1)[..., 0]
    npix = jnp.float32(H * W)
    step = jnp.floor((npix - h_last) / 255.0)                  # (B, C)
    csum = jnp.cumsum(h, axis=-1)
    cum_before = csum - h                                      # exclusive
    lut = jnp.floor((cum_before + jnp.floor(step / 2.0)[..., None]) /
                    jnp.maximum(step, 1.0)[..., None])
    lut = jnp.clip(lut, 0.0, 255.0)                            # (B, C, 256)
    # LUT apply with NO per-pixel gather (7 ns/lookup would cost ~17 ms
    # per batch): one-hot dot — XLA fuses the one-hot generator into the
    # MXU dot operand, so nothing big materializes.
    xi = x.astype(jnp.int32)                                   # (B,H,W,C)
    one = jax.nn.one_hot(xi, 256, dtype=jnp.float32)
    out = jnp.einsum("bhwcv,bcv->bhwc", one, lut)
    out = jnp.where(step[:, None, None, :] > 0, out, x)
    return _u8(out)


def op_invert(img, _m):
    return 255.0 - img


def op_posterize(img, m):
    """bits = max(1, round(8 - m*4)); keep top ``bits`` bits."""
    bits = jnp.maximum(1.0, jnp.round(8.0 - jnp.abs(m) * 4.0))
    q = (2.0 ** (8.0 - bits))[:, None, None, None]
    return jnp.floor(_u8(img) / q) * q


def op_solarize(img, m):
    thr = jnp.floor(256.0 - jnp.abs(m) * 256.0)[:, None, None, None]
    x = _u8(img)
    return jnp.where(x >= thr, 255.0 - x, x)


def op_solarize_add(img, m):
    add = jnp.floor(jnp.abs(m) * 110.0)[:, None, None, None]
    x = img
    return jnp.where(x < 128.0, jnp.clip(x + add, 0.0, 255.0), x)


def _pil_gray(img_u8):
    """PIL 'L' conversion: (R*299 + G*587 + B*114) / 1000, truncated."""
    r, g, b = img_u8[..., 0], img_u8[..., 1], img_u8[..., 2]
    return jnp.floor((r * 299.0 + g * 587.0 + b * 114.0) / 1000.0)


def op_color(img, m):
    """ImageEnhance.Color(1+m): blend(gray3, img, 1+m)."""
    x = _u8(img)
    gray = _pil_gray(x)[..., None]
    f = (1.0 + m)[:, None, None, None]
    return _u8(gray + (x - gray) * f)


def op_contrast(img, m):
    """ImageEnhance.Contrast(1+m): blend(mean_gray, img, 1+m) where mean
    is int(L.mean() + 0.5) over the grayscale image."""
    x = _u8(img)
    mean = jnp.floor(_pil_gray(x).mean(axis=(1, 2)) + 0.5)     # (B,)
    f = 1.0 + m
    mean = mean[:, None, None, None]
    return _u8(mean + (x - mean) * f[:, None, None, None])


def op_brightness(img, m):
    x = _u8(img)
    f = 1.0 + m
    return _u8(x * f[:, None, None, None])


def op_sharpness(img, m):
    """ImageEnhance.Sharpness(1+m): blend(SMOOTH-filtered, img, 1+m);
    the 1-px border stays unfiltered (PIL filter semantics)."""
    x = _u8(img)
    B, H, W, C = x.shape
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]],
                    jnp.float32) / 13.0
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    sm = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            sm = sm + k[dy, dx] * xpad[:, dy:dy + H, dx:dx + W, :]
    sm = _u8(sm)
    border = jnp.zeros((H, W), bool).at[0, :].set(True).at[-1, :] \
        .set(True).at[:, 0].set(True).at[:, -1].set(True)
    sm = jnp.where(border[None, :, :, None], x, sm)
    f = 1.0 + m
    return _u8(sm + (x - sm) * f[:, None, None, None])


_POINTWISE = {
    0: op_autocontrast, 1: op_equalize, 2: op_invert, 4: op_posterize,
    5: op_solarize, 6: op_solarize_add, 7: op_color, 8: op_contrast,
    9: op_brightness, 10: op_sharpness,
}


# ---------------------------------------------------------------------------
# full RandAugment slot: one warp + all pointwise candidates, select
# ---------------------------------------------------------------------------

def apply_rand_augment_slot(img, op_id, m, fill):
    """Apply one RandAugment policy slot to the whole batch.

    img: (B, H, W, 3) float 0..255 (uint8-valued); op_id: (B,) int32 into
    the canonical table; m: (B,) signed magnitude in [-1, 1]."""
    size = img.shape[1]
    k1, t1, k2, t2, k3, t3, c = geometric_params(op_id, m, size)
    warped = three_pass_warp(img, k1, t1, k2, t2, k3, t3, fill,
                             cy=c, cx=c)
    out = warped     # geometric ids already correct; pointwise overwrite
    for oid, fn in _POINTWISE.items():
        sel = (op_id == oid)[:, None, None, None]
        out = jnp.where(sel, fn(img, m), out)
    return out


def random_erase(img, on, y, x, eh, ew, fill, fill_std, noise_key):
    """mmcls RandomErasing(mode='rand'): fill the box with
    fill + std*N(0,1) (std==0 -> constant fill)."""
    B, H, W, C = img.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    in_box = ((ys >= y[:, None, None]) & (ys < (y + eh)[:, None, None]) &
              (xs >= x[:, None, None]) & (xs < (x + ew)[:, None, None]))
    mask = (in_box & on[:, None, None])[..., None]
    fill = jnp.asarray(fill, jnp.float32)
    std = jnp.asarray(fill_std, jnp.float32)
    if float(np.max(np.asarray(fill_std))) > 0.0:
        patch = fill + std * jax.random.normal(noise_key, img.shape)
    else:
        patch = jnp.broadcast_to(fill, img.shape)
    return jnp.where(mask, jnp.clip(patch, 0.0, 255.0), img)


# ---------------------------------------------------------------------------
# PIL HSV round trip (seg PhotoMetricDistortion)
# ---------------------------------------------------------------------------

def pil_rgb_to_hsv(img_u8):
    """PIL ``convert('HSV')`` on uint8-valued float input -> (h, s, v)
    float32 in 0..255.

    Pinned by probe vs Pillow 11 (2026-08-21, tests/test_device_augment):
    S and V are bit-exact (integer formula: s = 255*cr // uv); H follows
    the sixths decomposition h_units = {bc-gc | 510+rc-bc | 1020+gc-rc}
    (+1530 if negative) // 6 with rc/gc/bc = 255*(uv-x)//cr — exact on
    92% of inputs, +-1 H level on the rest (Pillow computes H via a
    float64 colorsys transliteration with truncation; its double
    rounding lands one unit below the exact integer quotient on
    exact-multiple inputs)."""
    r, g, b = (img_u8[..., k].astype(jnp.int32) for k in range(3))
    uv = jnp.maximum(r, jnp.maximum(g, b))
    lv = jnp.minimum(r, jnp.minimum(g, b))
    cr = uv - lv
    crs = jnp.maximum(cr, 1)
    s = (255 * cr) // jnp.maximum(uv, 1)
    rc = (255 * (uv - r)) // crs
    gc = (255 * (uv - g)) // crs
    bc = (255 * (uv - b)) // crs
    h = jnp.where(r == uv, bc - gc,
                  jnp.where(g == uv, 2 * 255 + rc - bc,
                            4 * 255 + gc - rc))
    h = jnp.where(h < 0, h + 6 * 255, h) // 6
    flat = cr == 0
    h = jnp.where(flat, 0, h)
    s = jnp.where(flat, 0, s)
    return (h.astype(jnp.float32), s.astype(jnp.float32),
            uv.astype(jnp.float32))


def pil_hsv_to_rgb(h, s, v):
    """PIL HSV->RGB, float32 0..255 channels -> (..., 3) float 0..255.

    Exhaustively verified against Pillow over all 256^3 uint8 HSV inputs
    (float64 colorsys transliteration with round-half-even is bit-exact;
    this f32 version can land +-1 on rare near-tie fractions)."""
    h6 = h * (6.0 / 255.0)
    i = jnp.floor(h6)
    f = h6 - i
    p = jnp.round(v * (255.0 - s) * (1.0 / 255.0))
    q = jnp.round(v * (255.0 - s * f) * (1.0 / 255.0))
    t = jnp.round(v * (255.0 - s * (1.0 - f)) * (1.0 / 255.0))
    i = jnp.mod(i, 6.0)
    sel = [i == k for k in range(6)]

    def pick(opts):
        out = opts[5]
        for k in range(4, -1, -1):
            out = jnp.where(sel[k], opts[k], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    gray = s == 0
    r = jnp.where(gray, v, r)
    g = jnp.where(gray, v, g)
    b = jnp.where(gray, v, b)
    return jnp.stack([r, g, b], axis=-1)


def photometric_distortion(img, pm):
    """Batched mmseg-style PhotoMetricDistortion with host-drawn params
    (data/pipelines.py PhotoMetricDistortion.draw_params — neutral values
    where a sub-op's coin landed off).

    img: (B, H, W, 3) float 0..255. pm keys, all (B,): ``bright`` add
    delta (0=off), ``c_pre``/``c_post`` contrast multipliers (1=off),
    ``hsv_on`` bool (the host's HSV round trip happened — lossy even
    with neutral sat/hue), ``sat`` multiplier, ``hue`` additive delta.
    Mirrors the host op's value chain exactly: float adds/mults, clip +
    truncate to uint8 at the HSV boundary, final clip WITHOUT rounding.
    """
    def b4(x):
        return x[:, None, None, None]

    def b3(x):
        return x[:, None, None]

    x = img + b4(pm["bright"])
    x = x * b4(pm["c_pre"])
    # HSV branch (host: np.clip(img,0,255).astype(uint8) -> PIL HSV)
    xu = jnp.floor(jnp.clip(x, 0.0, 255.0))
    h, s, v = pil_rgb_to_hsv(xu)
    s = jnp.floor(jnp.clip(s * b3(pm["sat"]), 0.0, 255.0))
    h = jnp.floor(jnp.mod(h + b3(pm["hue"]), 256.0))
    rgb = pil_hsv_to_rgb(h, s, v)
    x = jnp.where(b4(pm["hsv_on"]), rgb, x)
    x = x * b4(pm["c_post"])
    return jnp.clip(x, 0.0, 255.0)


# ---------------------------------------------------------------------------
# seg train augment stage (ratio resize + crop + flip + photometric)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SegDeviceAugmentConfig:
    src_size: int = 512          # static source tile size (Potsdam: 512)
    out_size: int = 512          # crop_size / padded output


def seg_device_augment(img, aug, cfg: SegDeviceAugmentConfig):
    """The seg train pipeline's pixel work on device, batched.

    Host op order (configs/_base_/seg/potsdam_IRRG_all.py, mirroring
    /root/reference/configs/_base_/seg/potsdam_IRRG_all.py:10-20):
    ratio-range Resize -> RandomCrop -> RandomFlip -> PhotoMetric ->
    Normalize -> Pad. Here resize+crop collapse into ONE PIL-bilinear
    matrix pair (computing only the cropped rows of the resized image is
    exactly resize-then-slice), the flip folds into the matrix
    (mirror_out), photometric runs batched, and Normalize/Pad stay with
    the caller (device_normalize + img_hw masking). The label runs the
    same ops host-side in the planner (nearest resize + crop are
    row-index work, not pixel filtering).

    img: (B, S, S, 3) uint8 0..255. aug keys (B,) each: resize_h/w
    (ratio-resized size), crop_y/x (origin in resized coords), crop_h/w,
    flip, pm_* (photometric_distortion params). Returns (B, out, out, 3)
    float32 raw 0..255. The pad region (rows/cols >= crop_h/w) leaves
    the resample as zero but picks up the photometric adds — the caller
    MUST mask by img_hw = (crop_h, crop_w) after normalize (matching the
    host's Normalize-then-Pad(0) zeros; engine/train_step.seg_loss_fn
    does)."""
    S = img.shape[1]
    x = img.astype(jnp.float32)
    B = x.shape[0]
    src = jnp.full((B,), S, jnp.int32)
    zeros = jnp.zeros((B,), jnp.int32)
    my = pil_resample_matrix(
        cfg.out_size, S, win_start=zeros, win_size=src,
        row0=aug["crop_y"], out_len=aug["resize_h"],
        n_valid=aug["crop_h"], kernel="bilinear")
    mx = pil_resample_matrix(
        cfg.out_size, S, win_start=zeros, win_size=src,
        row0=aug["crop_x"], out_len=aug["resize_w"],
        n_valid=aug["crop_w"], kernel="bilinear",
        mirror_out=aug["flip"])
    out = apply_resample(x, my, mx)
    out = jnp.clip(jnp.round(out), 0.0, 255.0)    # PIL resize -> uint8
    pm = {k[len("pm_"):]: aug[k] for k in aug if k.startswith("pm_")}
    return photometric_distortion(out, pm)


# ---------------------------------------------------------------------------
# det train augment stage (flip + [AutoAugment] resize / crop / resize)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DetDeviceAugmentConfig:
    src_hw: Tuple[int, int] = (800, 800)   # static source bucket (DIOR)
    mid_hw: Optional[Tuple[int, int]] = None   # stage-1 buffer (<= src)

    @property
    def mid(self):
        return self.mid_hw or self.src_hw


def det_device_augment(img, aug, out_hw, cfg: DetDeviceAugmentConfig):
    """The det train pipeline's pixel work on device, batched.

    Host op orders covered (DetDeviceAugmentPlanner normalizes both to
    one two-stage program):
    * MTL det: Resize(keep_ratio) -> RandomFlip
      (configs/_base_/det/dior.py, mirroring
      /root/reference/configs/_base_/det/dior.py:11-20)
    * single-task DINO: RandomFlip -> AutoAugment{[Resize] |
      [Resize, RandomCrop, Resize]}
      (/root/reference/configs/det/dino_4scale_r50_1x1_50e_dior.py:110-150)

    Program: stage-1 PIL-bilinear resize of the valid source (with a
    pre-resize flip folded in as a source mirror — flip commutes with a
    full-frame separable resize exactly), uint8 rounding (the host's
    PIL boundary), then stage-2 resize of a crop window of the stage-1
    result (identity window/scale when the branch had no second resize;
    a post-resize flip folds in as an output mirror). Box/meta math runs
    entirely host-side in the planner. Normalize + pad-masking stay with
    the caller (img_hw = final image size).

    img: (B, srcH, srcW, 3) uint8 (valid region [0, src_h)x[0, src_w)).
    aug keys (B,) each: src_h/w, flip_src, flip_out, s1_h/w, crop_y/x,
    crop_h/w, s2_h/w. out_hw: static output bucket (from the batch's
    zero-width ``out_template`` leaf). Returns (B, outH, outW, 3)
    float32 raw 0..255, zero outside the valid region."""
    srcH, srcW = img.shape[1], img.shape[2]
    midH, midW = cfg.mid
    outH, outW = out_hw
    x = img.astype(jnp.float32)
    B = x.shape[0]
    zeros = jnp.zeros((B,), jnp.int32)
    my1 = pil_resample_matrix(
        midH, srcH, win_start=zeros, win_size=aug["src_h"], row0=zeros,
        out_len=aug["s1_h"], n_valid=aug["s1_h"], kernel="bilinear")
    mx1 = pil_resample_matrix(
        midW, srcW, win_start=zeros, win_size=aug["src_w"], row0=zeros,
        out_len=aug["s1_w"], n_valid=aug["s1_w"], kernel="bilinear",
        mirror_src=aug["flip_src"])
    x = jnp.clip(jnp.round(apply_resample(x, my1, mx1)), 0.0, 255.0)
    my2 = pil_resample_matrix(
        outH, midH, win_start=aug["crop_y"], win_size=aug["crop_h"],
        row0=zeros, out_len=aug["s2_h"], n_valid=aug["s2_h"],
        kernel="bilinear")
    mx2 = pil_resample_matrix(
        outW, midW, win_start=aug["crop_x"], win_size=aug["crop_w"],
        row0=zeros, out_len=aug["s2_w"], n_valid=aug["s2_w"],
        kernel="bilinear", mirror_out=aug["flip_out"])
    return jnp.clip(jnp.round(apply_resample(x, my2, mx2)), 0.0, 255.0)


def cls_device_augment(img, aug, cfg: DeviceAugmentConfig,
                       noise_key=None):
    """The full cls train augment stage on device.

    img: (B, S, S, 3) uint8/float RGB 0..255 (decoded, un-normalized).
    aug: per-sample parameter records from DeviceAugmentPlanner:
      crop_y/x/h/w (B,) i32; flip (B,) bool; op_id (B, P) i32;
      op_m (B, P) f32; erase_on (B,) bool; erase_y/x/h/w (B,) i32.
    Returns (B, out, out, 3) float32 in 0..255 (Normalize is applied by
    the caller, mirroring the host pipeline order)."""
    x = img.astype(jnp.float32)
    x = random_resized_crop(x, aug["crop_y"], aug["crop_x"],
                            aug["crop_h"], aug["crop_w"], cfg.out_size)
    x = jnp.where(aug["flip"][:, None, None, None], x[:, :, ::-1, :], x)
    for p in range(cfg.num_policies):
        x = apply_rand_augment_slot(x, aug["op_id"][:, p],
                                    aug["op_m"][:, p], cfg.fill)
    if noise_key is None:
        noise_key = jax.random.key(0)
    x = random_erase(x, aug["erase_on"], aug["erase_y"], aug["erase_x"],
                     aug["erase_h"], aug["erase_w"], cfg.erase_fill,
                     cfg.erase_fill_std, noise_key)
    return x
