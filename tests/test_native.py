"""Native host library vs numpy reference implementations."""

import numpy as np
import pytest

from yolo_quantization_tpu.data.image import letterbox as np_letterbox
from yolo_quantization_tpu.eval import detect
from yolo_quantization_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def make_dets(rng, m=50, classes=5):
    boxes = np.stack([
        rng.uniform(0.1, 0.9, m), rng.uniform(0.1, 0.9, m),
        rng.uniform(0.05, 0.4, m), rng.uniform(0.05, 0.4, m),
    ], axis=1).astype(np.float32)
    obj = rng.uniform(0, 1, m).astype(np.float32)
    cls = rng.uniform(0, 1, (m, classes)).astype(np.float32)
    return boxes, obj, cls


class TestNMS:
    def test_nms_obj_matches_numpy_survivor_set(self, rng):
        boxes, obj, cls = make_dets(rng)
        nb, no, nc = native.nms_obj(boxes, obj, cls, 0.3)
        rb, ro, rc = detect.nms_obj(boxes, obj, cls, 0.3)
        # native keeps input order; numpy returns sorted — compare survivor
        # sets as (objectness, box) multisets
        def key(b, o):
            alive = o > 0
            return sorted(
                (round(float(o[i]), 6), *np.round(b[i], 6).tolist())
                for i in np.where(alive)[0]
            )
        assert key(nb, no) == key(rb, ro)

    def test_nms_sort_matches_numpy(self, rng):
        boxes, obj, cls = make_dets(rng)
        probs = obj[:, None] * cls
        got = native.nms_sort(boxes, probs, 0.3)
        ref = detect.nms_sort_per_class(boxes, probs, 0.3)
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestMatching:
    def test_match_truths_matches_python(self, rng):
        boxes, obj, _ = make_dets(rng, m=30)
        truths = np.stack([
            rng.uniform(0.2, 0.8, 7), rng.uniform(0.2, 0.8, 7),
            rng.uniform(0.1, 0.3, 7), rng.uniform(0.1, 0.3, 7),
        ], axis=1).astype(np.float32)
        tp_n, iou_n = native.match_truths(boxes, obj, truths, 0.3, 0.1)
        # python reference
        tp_p, iou_p = 0, 0.0
        for t in truths:
            live = obj > 0.3
            best = float(np.max(detect.box_iou(boxes[live], t))) if live.any() else 0.0
            iou_p += best
            if best > 0.1:
                tp_p += 1
        assert tp_n == tp_p
        assert iou_n == pytest.approx(iou_p, abs=1e-5)


class TestLetterbox:
    def test_matches_numpy_letterbox(self, rng):
        im = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
        got = native.letterbox(im, 64, 64)
        ref = np_letterbox(im, 64, 64)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_speed_sanity(self, rng):
        """Native letterbox should not be slower than numpy (smoke check)."""
        import time

        im = rng.uniform(0, 1, (720, 1280, 3)).astype(np.float32)
        native.letterbox(im, 416, 416)  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            native.letterbox(im, 416, 416)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            np_letterbox(im, 416, 416)
        t_numpy = time.perf_counter() - t0
        assert t_native < t_numpy * 3  # loose: just catch pathology
