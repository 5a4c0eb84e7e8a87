"""Hand-computed COCO-mAP golden fixtures (VERDICT r3 #5 "Missing"/#9).

The numpy evaluator (evaluation/coco_map.py) and the C++ core
(csrc/coco_eval.cpp via evaluation/native.py) only cross-checked each
other; a shared convention bug would go undetected (pycocotools is not
installed here). These fixtures pin the conventions to analytically
derived AP values:

* greedy score-order matching (a matched GT is gone for later dets,
  even higher-IoU ones) — the "double-match temptation";
* stable ordering of score ties (mergesort; first-listed det first);
* 101-point interpolated AP with the precision envelope;
* maxDets truncation (lowest scores dropped BEFORE matching);
* classes with no GT excluded from the mean (NaN), not zero;
* multi-threshold averaging.

Every case asserts BOTH implementations against the hand value.
"""

import numpy as np
import pytest

from rscotr_tpu.evaluation.coco_map import eval_map
from rscotr_tpu.evaluation.native import class_ap_native

_probe = class_ap_native(
    np.zeros((1, 4), np.float32), np.ones(1, np.float32),
    np.zeros(1, np.int64),
    np.zeros((1, 4), np.float32), np.asarray([0, 1], np.int64), 1, 0.5)
HAS_NATIVE = _probe is not None

BACKENDS = [False] + ([True] if HAS_NATIVE else [])


def _ann(bboxes, labels):
    return {"bboxes": np.asarray(bboxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64).reshape(-1)}


def _det(*rows):
    return np.asarray(rows, np.float32).reshape(-1, 5)


@pytest.mark.parametrize("native", BACKENDS)
class TestGoldenAP:
    def _run(self, dets, anns, num_classes, native, **kw):
        return eval_map(dets, anns, num_classes, use_native=native, **kw)

    def test_perfect_single_detection(self, native):
        out = self._run(
            [[_det([0, 0, 10, 10, 0.9])]],
            [_ann([[0, 0, 10, 10]], [0])], 1, native)
        assert out["bbox_mAP"] == pytest.approx(1.0)

    def test_greedy_matching_and_interp(self, native):
        """2 GTs; score order: A (IoU .6 with GT1), B (IoU 1.0 with the
        ALREADY-TAKEN GT1 -> FP), C (TP on GT2). tp=[1,0,1] ->
        recall [.5,.5,1], precision [1,.5,2/3], envelope [1,2/3,2/3]:
        AP = (51*1 + 50*(2/3))/101 = 0.8349835. A non-greedy matcher
        (B allowed onto GT1) would give 1.0."""
        dets = [[_det([0, 0, 10, 6, 0.9],     # A: IoU .6 vs GT1
                      [0, 0, 10, 10, 0.8],    # B: IoU 1.0 vs GT1
                      [20, 0, 30, 10, 0.7])]]  # C: IoU 1.0 vs GT2
        anns = [_ann([[0, 0, 10, 10], [20, 0, 30, 10]], [0, 0])]
        out = self._run(dets, anns, 1, native)
        want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101.0
        assert out["bbox_mAP"] == pytest.approx(want, abs=1e-4)

    def test_score_tie_stable_order(self, native):
        """Two dets at the same score: stable (mergesort) ordering keeps
        the first-listed det first. FP listed first -> recall [0,1],
        precision [0,.5], envelope [.5,.5] -> AP = 0.5 (a sort that
        reorders ties the other way would give 1.0)."""
        dets = [[_det([50, 50, 60, 60, 0.5],    # FP (no GT there)
                      [0, 0, 10, 10, 0.5])]]    # TP
        anns = [_ann([[0, 0, 10, 10]], [0])]
        out = self._run(dets, anns, 1, native)
        assert out["bbox_mAP"] == pytest.approx(0.5, abs=1e-4)

    def test_max_dets_truncation(self, native):
        """max_dets=2 drops the lowest-scored det BEFORE matching; the
        only TP is rank 3 -> AP = 0 (1/3-recall-ish without truncation)."""
        dets = [[_det([50, 50, 60, 60, 0.9],
                      [70, 70, 80, 80, 0.8],
                      [0, 0, 10, 10, 0.7])]]
        anns = [_ann([[0, 0, 10, 10]], [0])]
        out = self._run(dets, anns, 1, native, max_dets=2)
        assert out["bbox_mAP"] == pytest.approx(0.0, abs=1e-6)
        out_full = self._run(dets, anns, 1, native, max_dets=100)
        # tp=[0,0,1]: recall [0,0,1], prec [0,0,1/3], envelope 1/3
        # everywhere -> AP = 1/3
        assert out_full["bbox_mAP"] == pytest.approx(1.0 / 3.0, abs=1e-4)

    def test_empty_class_excluded_from_mean(self, native):
        """Class 1 has no GT anywhere (only a spurious det): excluded
        (NaN), NOT counted as zero — mAP equals class 0's AP."""
        dets = [[_det([0, 0, 10, 10, 0.9]),     # class 0: perfect
                 _det([50, 50, 60, 60, 0.3])]]  # class 1: FP, no GT
        anns = [_ann([[0, 0, 10, 10]], [0])]
        out = self._run(dets, anns, 2, native)
        assert out["bbox_mAP"] == pytest.approx(1.0)

    def test_class_with_gt_but_no_dets_is_zero(self, native):
        dets = [[_det([0, 0, 10, 10, 0.9]), np.zeros((0, 5))]]
        anns = [_ann([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 1])]
        out = self._run(dets, anns, 2, native)
        assert out["bbox_mAP"] == pytest.approx(0.5)   # (1.0 + 0.0)/2

    def test_multi_threshold_average(self, native):
        """IoU .6 det: TP at thr .5, FP at thr .75 -> mAP = .5; the
        per-threshold keys expose both legs."""
        dets = [[_det([0, 0, 10, 6, 0.9])]]     # IoU .6 vs the GT
        anns = [_ann([[0, 0, 10, 10]], [0])]
        out = self._run(dets, anns, 1, native, iou_thrs=(0.5, 0.75))
        assert out["bbox_mAP_50"] == pytest.approx(1.0)
        assert out["bbox_mAP_75"] == pytest.approx(0.0)
        assert out["bbox_mAP"] == pytest.approx(0.5)

    def test_cross_image_ranking(self, native):
        """Ranking is GLOBAL across images: image 0's FP at score .9
        precedes image 1's TP at .8. tp=[0,1]: recall [0,1], precision
        [0,.5] -> AP = .5 (per-image AP averaging would give 1.0 for
        image 1 and NaN for image 0)."""
        dets = [[_det([50, 50, 60, 60, 0.9])],
                [_det([0, 0, 10, 10, 0.8])]]
        anns = [_ann(np.zeros((0, 4)), np.zeros((0,))),
                _ann([[0, 0, 10, 10]], [0])]
        out = self._run(dets, anns, 1, native)
        assert out["bbox_mAP"] == pytest.approx(0.5, abs=1e-4)


def test_native_backend_present():
    """The C++ core must actually be exercised on this image — if this
    fires, the parametrized golden tests above silently covered numpy
    only (acceptable only where csrc can't build)."""
    if not HAS_NATIVE:
        pytest.skip("csrc coco_eval not built on this host")
    assert HAS_NATIVE


def test_backends_agree_on_random_workload():
    if not HAS_NATIVE:
        pytest.skip("csrc coco_eval not built on this host")
    rng = np.random.default_rng(0)
    K, N = 3, 12
    dets, anns = [], []
    for _ in range(N):
        per_cls = []
        for _c in range(K):
            n = int(rng.integers(0, 6))
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(4, 30, (n, 2))
            sc = rng.uniform(0, 1, (n, 1))
            per_cls.append(np.concatenate(
                [xy, xy + wh, sc], -1).astype(np.float32))
        dets.append(per_cls)
        m = int(rng.integers(0, 8))
        xy = rng.uniform(0, 80, (m, 2))
        wh = rng.uniform(4, 30, (m, 2))
        anns.append(_ann(np.concatenate([xy, xy + wh], -1),
                         rng.integers(0, K, m)))
    a = eval_map(dets, anns, K, iou_thrs=(0.5, 0.75), use_native=True)
    b = eval_map(dets, anns, K, iou_thrs=(0.5, 0.75), use_native=False)
    for k in b:
        assert a[k] == pytest.approx(b[k], abs=1e-6), k
