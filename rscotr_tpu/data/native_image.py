"""ctypes binding for the native image-decode core (csrc/image_core.cpp).

The reference's input pipeline decodes through native code (cv2 /
turbojpeg inside the mm pipelines) under torch's C++ DataLoader workers;
this is the TPU-build analog for the thread-based TaskDataLoader: JPEG
(libjpeg) / PNG (libpng) decode to RGB8 with the GIL RELEASED for the
duration of the C call, so decode parallelism is real across loader
threads. Auto-builds with make on first use; ``imdecode`` returns None
when the native lib is unavailable or the format/bytes aren't decodable
(callers fall back to PIL).

Opt-out: set RSCOTR_NO_NATIVE_IMDECODE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_csrc_dir(), "librscotr_image.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", _csrc_dir(),
                            "librscotr_image.so"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.isfile(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.imdecode_dims.restype = ctypes.c_int
        lib.imdecode_dims.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
        lib.imdecode_rgb.restype = ctypes.c_int
        lib.imdecode_rgb.argtypes = [u8p, ctypes.c_int64, u8p,
                                     ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def imdecode(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG/PNG bytes to an (H, W, 3) RGB uint8 array, or None
    if the native lib is missing or the bytes aren't decodable."""
    if os.environ.get("RSCOTR_NO_NATIVE_IMDECODE"):
        return None
    lib = load_native()
    if lib is None or not data:
        return None
    buf = np.frombuffer(data, np.uint8)
    bufp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    if lib.imdecode_dims(bufp, len(data), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.imdecode_rgb(bufp, len(data),
                          out.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_uint8)),
                          out.size)
    return out if rc == 0 else None


def imread(path: str) -> Optional[np.ndarray]:
    """Native file read + decode; None -> caller falls back to PIL."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return imdecode(data)
