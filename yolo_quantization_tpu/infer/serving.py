"""Continuous-batching inference server.

The production serving layer over infer/engine.py: callers submit single
images (any size) and get detection futures; a batcher thread letterboxes on
host worker threads, groups requests into fixed batch buckets (static shapes
=> one compiled program per bucket, no recompiles), runs the device, and
resolves futures with decoded, NMS'd detections.

The reference has no serving path — its closest analog is the single-image
test loop (examples/detector.c:878-950).  This is the "multi-host streaming /
continuous image batching" capability called for by BASELINE.json; multi-host
sharding composes by giving each host its own Server over its local devices
(data-parallel serving), since YOLO inference is embarrassingly parallel
across images.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from yolo_quantization_tpu.eval import detect
from yolo_quantization_tpu.utils import native


@dataclass
class Detection:
    box: np.ndarray       # (4,) center-format, relative to the ORIGINAL image
    objectness: float
    class_probs: np.ndarray


@dataclass
class _Request:
    image: np.ndarray     # original HWC float32
    future: Future
    thresh: float
    nms: float
    enqueue_time: float = 0.0


class Server:
    """Continuous batching over a quantized (or float) Engine.

    submit() is thread-safe and non-blocking; the returned Future resolves to
    a list[Detection].  max_delay_ms bounds added latency: a partial batch is
    flushed when the oldest request has waited that long.
    """

    def __init__(
        self,
        engine,
        batch_size: int = 16,
        max_delay_ms: float = 5.0,
        preprocess_workers: int = 4,
        pipeline_depth: int = 2,
    ):
        self.engine = engine
        self.net = engine.program.net
        self.batch_size = batch_size
        self.max_delay = max_delay_ms / 1e3
        self._q: queue.Queue[_Request] = queue.Queue()
        self._pre = ThreadPoolExecutor(max_workers=preprocess_workers)
        self._stop = threading.Event()
        # pipelined continuous batching: the dispatch loop enqueues device
        # work and hands (requests, resolver) to the resolver thread, so
        # batch N+1 is gathered and dispatched while batch N's results are
        # still in flight — without this, the dispatch->fetch round trip
        # serializes and bounds throughput at ~1/RTT batches/sec regardless
        # of batch size.  The bounded queue (depth 2) is the backpressure
        # that keeps device-side queueing shallow.
        self._inflight: queue.Queue = queue.Queue(maxsize=pipeline_depth)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._thread.start()
        self._resolver.start()
        self.stats = {"batches": 0, "images": 0, "batch_fill_sum": 0.0}

    def submit(self, image: np.ndarray, thresh: float = 0.5, nms: float = 0.45) -> Future:
        fut: Future = Future()
        req = _Request(image=image, future=fut, thresh=thresh, nms=nms,
                       enqueue_time=time.monotonic())
        self._q.put(req)
        return fut

    def _gather_batch(self) -> list[_Request]:
        reqs: list[_Request] = []
        try:
            reqs.append(self._q.get(timeout=0.1))
        except queue.Empty:
            return reqs
        # drain the existing backlog non-blockingly FIRST: when requests have
        # queued behind a busy device, the oldest is already past its window
        # and the deadline loop below would flush a singleton — degenerating
        # the server to batch-of-1 exactly when batching matters most (found
        # by the r3 SLO run: fill pinned at 1/16 under 10x backlog)
        while len(reqs) < self.batch_size:
            try:
                reqs.append(self._q.get_nowait())
            except queue.Empty:
                break
        # then wait out the batching window for stragglers
        deadline = reqs[0].enqueue_time + self.max_delay
        while len(reqs) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                reqs.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return reqs

    def _loop(self):
        while not self._stop.is_set():
            reqs = self._gather_batch()
            if not reqs:
                continue
            try:
                self._dispatch_batch(reqs)
            except Exception as e:  # resolve futures with the error
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _dispatch_batch(self, reqs: list[_Request]):
        net = self.net
        # parallel host-side letterbox (native C++ when available)
        letterboxed = list(
            self._pre.map(lambda r: native.letterbox(r.image, net.width, net.height), reqs)
        )
        # pad to the fixed bucket so there is exactly one compiled shape
        batch = np.zeros((self.batch_size, net.height, net.width, 3), np.float32)
        for i, x in enumerate(letterboxed):
            batch[i] = x
        if hasattr(self.engine, "predict_async"):
            resolve = self.engine.predict_async(batch)
        else:
            out = self.engine.predict(batch)
            resolve = lambda: out  # noqa: E731 — already-resolved engines
        while not self._stop.is_set():
            try:
                self._inflight.put((reqs, resolve), timeout=0.25)
                return
            except queue.Full:
                continue

    def _resolve_loop(self):
        while not self._stop.is_set():
            try:
                reqs, resolve = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                self._finish_batch(reqs, resolve())
            except Exception as e:
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _finish_batch(self, reqs: list[_Request], outputs):
        net = self.net
        boxes, obj, cls = outputs
        self.stats["batches"] += 1
        self.stats["images"] += len(reqs)
        self.stats["batch_fill_sum"] += len(reqs) / self.batch_size
        for i, r in enumerate(reqs):
            h, w, _ = r.image.shape
            b = detect.correct_boxes(boxes[i], w, h, net.width, net.height)
            keep = obj[i] > r.thresh
            bb, oo, cc = native.nms_obj(b[keep], obj[i][keep], cls[i][keep], r.nms)
            dets = [
                Detection(box=bb[j], objectness=float(oo[j]), class_probs=cc[j])
                for j in np.argsort(-oo)
                if oo[j] > r.thresh
            ]
            # a client may have cancelled its future mid-batch; never let that
            # poison the other requests in the batch
            if not r.future.cancelled():
                try:
                    r.future.set_result(dets)
                except Exception:
                    pass

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2)
        self._resolver.join(timeout=2)
        # drain in-flight batches so no future is left unresolved
        try:
            while True:
                reqs, resolve = self._inflight.get_nowait()
                try:
                    self._finish_batch(reqs, resolve())
                except Exception as e:
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
        except queue.Empty:
            pass
        self._pre.shutdown(wait=True)
