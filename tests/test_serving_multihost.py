"""Multi-host serving (VERDICT r3 item 6).

infer/serving.py claims multi-host serving composes as one Server per host
over its local devices (data-parallel serving).  This test proves it: two
jax.distributed processes each run a full continuous-batching Server on the
same frames and must produce detections identical to each other AND to a
single-process Server — YOLO inference has no cross-host state, so the
composition is exact, not approximate.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "serving_worker.py")


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("serve")
    n = 2
    port = 12531
    procs, files = [], []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for i in range(n):
        f = str(out / f"s{i}.json")
        files.append(f)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, f"localhost:{port}", str(n), str(i), f],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
        )
    logs = []
    for p in procs:
        try:
            outp, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(outp)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"serving worker failed:\n{log[-3000:]}"
    return [json.load(open(f)) for f in files]


def test_hosts_agree(worker_results):
    """Both hosts' servers produce identical detections on the same frames."""
    a, b = worker_results
    assert a["detections"] == b["detections"]
    assert sum(len(d) for d in a["detections"]) > 0, "no detections at all"


def test_matches_single_process(worker_results):
    """The per-host servers reproduce the single-process Server exactly."""
    sys.path.insert(0, HERE)
    from serving_worker import make_frames, serve_frames

    single = serve_frames(make_frames())
    got = worker_results[0]["detections"]
    assert got == json.loads(json.dumps(single))  # same float rounding path
