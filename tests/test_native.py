"""Native (C++) eval core vs numpy oracle."""

import numpy as np
import pytest

from rscotr_tpu.evaluation import eval_map, intersect_and_union
from rscotr_tpu.evaluation.native import (load_native, seg_confusion_native)


def _random_case(seed, n_img=6, n_cls=3):
    rng = np.random.default_rng(seed)
    anns, dets = [], []
    for _ in range(n_img):
        n = int(rng.integers(0, 8))
        b = rng.uniform(0, 80, (n, 2))
        boxes = np.concatenate([b, b + rng.uniform(5, 20, (n, 2))],
                               1).astype(np.float32)
        anns.append({"bboxes": boxes,
                     "labels": rng.integers(0, n_cls, n)})
        per_class = []
        for c in range(n_cls):
            m = int(rng.integers(0, 10))
            db = rng.uniform(0, 80, (m, 2))
            d = np.concatenate(
                [db, db + rng.uniform(5, 20, (m, 2)),
                 rng.uniform(0, 1, (m, 1))], 1).astype(np.float32)
            # half the detections loosely track a GT box
            for k in range(min(m, len(boxes))):
                if rng.uniform() < 0.5:
                    d[k, :4] = boxes[k % len(boxes)] + \
                        rng.normal(0, 2, 4)
            per_class.append(d)
        dets.append(per_class)
    return dets, anns


needs_native = pytest.mark.skipif(load_native() is None,
                                  reason="native lib unavailable")


@needs_native
class TestNativeCocoEval:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_numpy(self, seed):
        dets, anns = _random_case(seed)
        m_native = eval_map(dets, anns, 3, [0.5, 0.75], use_native=True)
        m_numpy = eval_map(dets, anns, 3, [0.5, 0.75], use_native=False)
        for k in m_numpy:
            np.testing.assert_allclose(m_native[k], m_numpy[k], atol=1e-6,
                                       err_msg=k)


@needs_native
class TestNativeSegConfusion:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pred = rng.integers(0, 7, (64, 64)).astype(np.int32)
        label = rng.integers(0, 6, (64, 64)).astype(np.int32)
        want = intersect_and_union(pred, label, 5, ignore_index=5)
        got = seg_confusion_native(pred, label, 5, ignore_index=5)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
