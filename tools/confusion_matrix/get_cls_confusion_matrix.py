#!/usr/bin/env python
"""Build + plot a classification confusion matrix from saved gt/pred arrays.

Capability-equivalent of /root/reference/tools/confusion_matrix/
get_cls_confusion_matrix.py + plot_confusion_matrix.py (sklearn/matplotlib
replaced by the in-tree numpy implementation; plot gated on matplotlib).
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from rscotr_tpu.evaluation import confusion_matrix  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt_npy", help=".npy of int labels")
    p.add_argument("pred_npy", help=".npy of (N, C) scores or int preds")
    p.add_argument("--out", default="confusion_matrix.npy")
    p.add_argument("--plot", default=None, help="optional png path")
    args = p.parse_args()

    gt = np.load(args.gt_npy)
    pred = np.load(args.pred_npy)
    if pred.ndim == 1:
        scores = np.zeros((len(pred), int(max(pred.max(), gt.max())) + 1))
        scores[np.arange(len(pred)), pred.astype(int)] = 1.0
        pred = scores
    cm = confusion_matrix(pred, gt.astype(int), pred.shape[1])
    np.save(args.out, cm)
    acc = np.trace(cm) / max(cm.sum(), 1)
    print(f"confusion matrix {cm.shape} -> {args.out}; accuracy={acc:.4f}")

    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            norm = cm / np.maximum(cm.sum(1, keepdims=True), 1)
            fig, ax = plt.subplots(figsize=(10, 10))
            ax.imshow(norm, cmap="Blues")
            ax.set_xlabel("prediction")
            ax.set_ylabel("ground truth")
            fig.savefig(args.plot, dpi=150, bbox_inches="tight")
            print(f"plot -> {args.plot}")
        except ImportError:
            print("matplotlib unavailable; skipped plot")


if __name__ == "__main__":
    main()
