"""ctypes bindings for the native eval core (csrc/librscotr_eval.so).

Auto-builds with make on first use when a toolchain is present; every entry
point has a numpy fallback so the framework runs without the native lib.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_csrc_dir(), "librscotr_eval.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", _csrc_dir()], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.isfile(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.coco_eval_class_ap.restype = ctypes.c_double
        lib.coco_eval_class_ap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_double]
        lib.seg_confusion.restype = None
        lib.seg_confusion.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def class_ap_native(det_boxes: np.ndarray, det_scores: np.ndarray,
                    det_img: np.ndarray, gt_boxes: np.ndarray,
                    gt_start: np.ndarray, n_img: int,
                    iou_thr: float) -> Optional[float]:
    lib = load_native()
    if lib is None:
        return None
    det_boxes = np.ascontiguousarray(det_boxes, np.float32)
    det_scores = np.ascontiguousarray(det_scores, np.float32)
    det_img = np.ascontiguousarray(det_img, np.int32)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    gt_start = np.ascontiguousarray(gt_start, np.int64)
    ap = lib.coco_eval_class_ap(
        _ptr(det_boxes, ctypes.c_float), _ptr(det_scores, ctypes.c_float),
        _ptr(det_img, ctypes.c_int32), len(det_scores),
        _ptr(gt_boxes, ctypes.c_float), _ptr(gt_start, ctypes.c_int64),
        n_img, iou_thr)
    return float("nan") if ap < 0 else float(ap)


def seg_confusion_native(pred: np.ndarray, label: np.ndarray,
                         num_classes: int, ignore_index: int):
    lib = load_native()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred.reshape(-1), np.int32)
    label = np.ascontiguousarray(label.reshape(-1), np.int32)
    inter = np.zeros(num_classes, np.int64)
    ap_ = np.zeros(num_classes, np.int64)
    al = np.zeros(num_classes, np.int64)
    lib.seg_confusion(_ptr(pred, ctypes.c_int32),
                      _ptr(label, ctypes.c_int32), len(pred),
                      num_classes, ignore_index,
                      _ptr(inter, ctypes.c_int64),
                      _ptr(ap_, ctypes.c_int64), _ptr(al, ctypes.c_int64))
    union = ap_ + al - inter
    return inter, union, ap_, al
