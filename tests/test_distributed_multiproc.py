"""Multi-process jax.distributed training (VERDICT r1 item 4).

The reference's flagship parallel feature is multi-GPU data-parallel training
(src/network.c:1164 train_networks: pthread-per-GPU + stale weight averaging).
Our equivalent is one jitted step over a global mesh with per-step gradient
psum.  This test proves the MULTI-PROCESS path — 2 jax.distributed processes
with 4 virtual CPU devices each forming one 8-device cluster — produces the
same loss and updated params as the single-process 8-device mesh run, to
float32 reduction-order tolerance.

Also covers the honest-failure contract of parallel/distributed.initialize:
an explicit coordinator that cannot be reached must raise, not silently
degrade to single-host.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist")
    n = 2
    port = 12521
    procs, files = [], []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for i in range(n):
        f = str(out / f"w{i}.json")
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
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(f)) for f in files]


def test_workers_agree(worker_results):
    """Both processes see the identical replicated result."""
    losses = [r["loss"] for r in worker_results]
    sums = [r["checksum"] for r in worker_results]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert sums[0] == pytest.approx(sums[1], rel=1e-6)
    assert np.isfinite(losses[0])


def test_matches_single_process(worker_results):
    """The 2-process global-mesh step reproduces the single-process 8-device
    step (same seeds, same global batch) within float reduction-order
    tolerance.

    Not bit-for-bit: GSPMD lowers the in-graph cross-device reductions (BN
    batch statistics, loss/grad means) to different all-reduce schedules for
    a 2x4-process topology than for 8 local devices, and the f32 ordering
    differences amplify through batch normalization.  Within one topology
    the result IS deterministic (test_workers_agree checks the replicas
    bitwise-agree across processes)."""
    import jax

    from yolo_quantization_tpu.models import zoo
    from yolo_quantization_tpu.parallel import mesh as pmesh
    from yolo_quantization_tpu.train.loss import MAX_BOXES
    from yolo_quantization_tpu.train.qat import (
        TrainConfig, init_train_state, make_train_step,
    )

    net = zoo.yolov3_tiny(classes=2, width=96, height=96)
    cfg = TrainConfig(burn_in=0, quant_start_step=0)
    state = init_train_state(net, cfg, jax.random.PRNGKey(0))
    step = make_train_step(net, cfg, qat=True)
    rng = np.random.default_rng(7)
    images = rng.uniform(0, 1, (8, 96, 96, 3)).astype(np.float32)
    truths = np.zeros((8, MAX_BOXES, 5), np.float32)
    truths[:, 0] = (0.5, 0.5, 0.4, 0.4, 0.0)
    mesh = pmesh.make_mesh()
    with mesh:
        state = pmesh.replicate(mesh, state)
        im, tr = pmesh.shard_batch(mesh, images, truths)
        new_state, metrics = step(state, im, tr)
    loss = float(metrics["loss"])
    checksum = float(
        sum(abs(np.asarray(l)).sum() for l in jax.tree.leaves(new_state.params))
    )
    assert worker_results[0]["loss"] == pytest.approx(loss, rel=2e-3)
    assert worker_results[0]["checksum"] == pytest.approx(checksum, rel=2e-3)


def test_explicit_coordinator_failure_is_loud():
    """initialize() with an explicit but unreachable coordinator must fail
    LOUDLY, never silently degrade to single-host (the round-1 bug:
    parallel/distributed.py swallowed the error).  JAX's coordination client
    aborts the process on deadline (not a catchable exception), so the
    contract checked here is: non-zero exit and no silent fallthrough."""
    code = (
        "import os, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from yolo_quantization_tpu.parallel import distributed\n"
        "try:\n"
        "    distributed.initialize('localhost:9', 2, 1, initialization_timeout=5)\n"
        "except Exception as e:\n"
        "    print('RAISED', type(e).__name__); sys.exit(3)\n"
        "print('SILENT'); sys.exit(0)\n"
    ) % os.path.dirname(HERE)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180,
    )
    assert proc.returncode != 0, "unreachable coordinator silently ignored"
    assert "SILENT" not in proc.stdout, proc.stdout + proc.stderr
