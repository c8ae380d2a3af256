"""Benchmark: quantized yolov3-tiny uint8 inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline (BASELINE.md): the reference's uint8 CPU path runs one 416x416 image
in 0.34 s => 2.94 images/sec.  vs_baseline = our images/sec/chip / 2.94.

Timing notes: on the tunneled dev TPU a host<->device round trip costs ~25 ms,
so throughput is measured amortized — N executions queued on the device
stream, one final scalar fetch forcing the chain — while batch-1 latency is
reported end-to-end (single call + result fetch).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.34  # reference README.md:58


def _build(use_pallas: bool = False):
    from yolo_quantization_tpu.eval import detect
    from yolo_quantization_tpu.infer.engine import build_forward
    from yolo_quantization_tpu.models.presets import flagship_program

    program = flagship_program()
    fwd = build_forward(program, use_pallas=use_pallas)
    arrays = jax.device_put(program.arrays)
    net = program.net

    @jax.jit
    def run(arrays, x):
        heads = fwd(arrays, x)
        boxes, obj, cls = detect.decode_all_heads(heads, net)
        boxes, obj, cls = detect.top_k_detections(boxes, obj, cls, 64)
        # tiny reduction so forcing the chain transfers 4 bytes, not megabytes
        return boxes, obj, cls, jnp.sum(obj)

    return run, arrays


def _device_batch(batch: int) -> jax.Array:
    """Generate inputs on-device — a host upload of a 416^2 batch over the
    tunneled dev TPU costs minutes of wall clock and is not what we measure."""
    return jax.jit(
        lambda k: jax.random.uniform(k, (batch, 416, 416, 3), jnp.float32),
        static_argnums=(),
    )(jax.random.PRNGKey(0))


def throughput(run, arrays, batch: int, chain: int = 20) -> float:
    x = _device_batch(batch)
    float(run(arrays, x)[3])  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(chain):
        out = run(arrays, x)
    float(out[3])  # force the chain
    dt = time.perf_counter() - t0
    return chain * batch / dt


def latency_batch1(run, arrays, iters: int = 20) -> float:
    x = _device_batch(1)
    float(run(arrays, x)[3])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(arrays, x)[3])
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def latency_batch1_device(run, arrays, chain: int = 50) -> float:
    """On-device batch-1 latency, tunnel-RTT-free: queue `chain` sequential
    batch-1 executions on the device stream and fetch one scalar — the
    amortized per-call time is device execution only (the single-call p50
    above is dominated by the ~25 ms dev-tunnel round trip)."""
    x = _device_batch(1)
    float(run(arrays, x)[3])
    t0 = time.perf_counter()
    out = None
    for _ in range(chain):
        out = run(arrays, x)
    float(out[3])
    return (time.perf_counter() - t0) / chain


def main():
    # measure both conv paths (XLA conv vs hand-fused Pallas kernels, which
    # are bit-identical) and report the best
    try:
        run_xla, arrays = _build(use_pallas=False)
        tp_xla = throughput(run_xla, arrays, batch=128)
    except Exception as e:  # still emit a JSON line if the device is sick
        print(f"# xla path failed: {type(e).__name__}: {e}", flush=True)
        print(json.dumps({
            "metric": "yolov3-tiny uint8 416x416 inference throughput (1 chip)",
            "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        return
    try:
        run_pl, arrays_pl = _build(use_pallas=True)
        tp_pallas = throughput(run_pl, arrays_pl, batch=128)
    except Exception as e:  # pallas compile issues must not sink the bench
        print(f"# pallas path failed: {type(e).__name__}: {e}", flush=True)
        tp_pallas = 0.0
    best_is_pallas = tp_pallas > tp_xla
    run = run_pl if best_is_pallas else run_xla
    arrays = arrays_pl if best_is_pallas else arrays
    p50 = latency_batch1(run, arrays)
    dev_lat = latency_batch1_device(run, arrays)
    images_per_sec = max(tp_xla, tp_pallas)
    result = {
        "metric": "yolov3-tiny uint8 416x416 inference throughput (1 chip)",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 1),
        "p50_latency_batch1_ms": round(p50 * 1e3, 3),
        "device_latency_batch1_ms": round(dev_lat * 1e3, 3),
        "images_per_sec_xla": round(tp_xla, 1),
        "images_per_sec_pallas": round(tp_pallas, 1),
        "conv_path": "pallas" if best_is_pallas else "xla",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
