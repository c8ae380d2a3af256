"""Continuous-batching server tests (CPU, small model)."""

import numpy as np
import pytest

from yolo_quantization_tpu.infer.engine import Engine
from yolo_quantization_tpu.infer.serving import Server
from yolo_quantization_tpu.models.presets import flagship_program


@pytest.fixture(scope="module")
def server():
    engine = Engine(flagship_program(classes=5, size=64), max_det=32)
    s = Server(engine, batch_size=4, max_delay_ms=20)
    yield s
    s.close()


class TestServer:
    def test_single_request(self, server, rng):
        im = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
        dets = server.submit(im, thresh=0.1).result(timeout=120)
        assert isinstance(dets, list)
        for d in dets:
            assert d.box.shape == (4,)
            assert 0 <= d.objectness <= 1
            assert d.class_probs.shape == (5,)

    def test_many_concurrent_requests_batch_together(self, server, rng):
        before = dict(server.stats)
        futs = [
            server.submit(
                rng.uniform(0, 1, (64 + 8 * i, 96, 3)).astype(np.float32),
                thresh=0.1,
            )
            for i in range(12)
        ]
        results = [f.result(timeout=240) for f in futs]
        assert len(results) == 12
        ran = server.stats["batches"] - before["batches"]
        # 12 requests in batches of <=4 => at least 3 batches, but batching
        # must have occurred (fewer batches than images)
        assert ran < 12
        assert server.stats["images"] - before["images"] == 12

    def test_mixed_thresholds(self, server, rng):
        im = rng.uniform(0, 1, (80, 80, 3)).astype(np.float32)
        lo = server.submit(im, thresh=0.0).result(timeout=120)
        hi = server.submit(im, thresh=0.99).result(timeout=120)
        assert len(lo) >= len(hi)
