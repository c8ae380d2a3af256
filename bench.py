"""Benchmark: quantized yolov3-tiny uint8 inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline (BASELINE.md): the reference's uint8 CPU path runs one 416x416 image
in 0.34 s => 2.94 images/sec.  vs_baseline = our images/sec/chip / 2.94.

Device truth (VERDICT r2 item 5): host-visible throughput through the dev
tunnel carries ~±4% noise plus a constant per-chain overhead, so the JSON
also reports
  - device_images_per_sec: from the difference of two chain lengths,
    (T(2N) - T(N)) / (N * batch) — the constant dispatch/fetch overhead and
    the final-result RTT cancel, leaving pure device execution time;
  - mfu_int8: device MAC throughput vs the chip's int8 peak (v5e: 394 TOPS),
    with MACs counted from the conv geometry of the actual graph.

Timing notes: on the tunneled dev TPU a host<->device round trip costs ~25 ms
and jax.block_until_ready does NOT force execution (docs/perf.md), so every
measurement queues executions on the device stream and fetches one scalar.

The Pallas conv path is opt-in (YOLOQ_BENCH_PALLAS=1): it is bit-identical
but measured slower than the XLA path on every layer that matters, and its
whole-graph compile over the dev tunnel costs tens of minutes (kill decision
+ per-layer table: docs/perf.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.34  # reference README.md:58
V5E_INT8_TOPS = 394e12  # TPU v5e peak int8, ops/sec (2 ops per MAC)


def conv_macs_per_image(program) -> float:
    """Sum conv MACs from the graph geometry (quantized + float convs)."""
    from yolo_quantization_tpu.nn.graph import ConvSpec

    net = program.net
    shapes = net.shapes()
    macs = 0
    for i, s in enumerate(net.specs):
        if not isinstance(s, ConvSpec):
            continue
        ih, iw, ic = shapes[i - 1] if i > 0 else (net.height, net.width, net.channels)
        oh, ow, oc = shapes[i]
        macs += oh * ow * oc * s.size * s.size * ic
    return float(macs)


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

    return run, arrays, program


def _device_batch(batch: int) -> jax.Array:
    """Generate inputs on-device — a host upload of a 416^2 batch over the
    tunneled dev TPU costs minutes of wall clock and is not what we measure."""
    return jax.jit(
        lambda k: jax.random.uniform(k, (batch, 416, 416, 3), jnp.float32),
        static_argnums=(),
    )(jax.random.PRNGKey(0))


def _chain_time(run, arrays, x, chain: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(chain):
        out = run(arrays, x)
    float(out[3])  # force the chain
    return time.perf_counter() - t0


def throughput(run, arrays, batch: int, chain: int = 20) -> tuple[float, float]:
    """Returns (host images/sec over a chain, device seconds per batch)."""
    x = _device_batch(batch)
    float(run(arrays, x)[3])  # compile + warm
    t1 = min(_chain_time(run, arrays, x, chain) for _ in range(2))
    t2 = min(_chain_time(run, arrays, x, 2 * chain) for _ in range(2))
    host_ips = chain * batch / t1
    dev_s_per_batch = max((t2 - t1) / chain, 1e-9)
    return host_ips, dev_s_per_batch


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
    """On-device batch-1 latency via the same two-chain overhead cancel."""
    x = _device_batch(1)
    float(run(arrays, x)[3])
    t1 = _chain_time(run, arrays, x, chain)
    t2 = _chain_time(run, arrays, x, 2 * chain)
    return max((t2 - t1) / chain, 1e-9)


def main():
    try:
        run, arrays, program = _build(use_pallas=False)
        per_batch = {}
        dev_per_batch = {}
        for batch in (128, 256):
            per_batch[batch], dev_per_batch[batch] = throughput(run, arrays, batch)
    except Exception as e:  # still emit a JSON line if the device is sick
        print(f"# xla path failed: {type(e).__name__}: {e}", flush=True)
        print(json.dumps({
            "metric": "yolov3-tiny uint8 416x416 inference throughput (1 chip)",
            "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        return
    # the Pallas path is only measured when explicitly requested; when it
    # isn't, the field is OMITTED (not a stale zero) — VERDICT r4 weak 7
    tp_pallas = None
    if os.environ.get("YOLOQ_BENCH_PALLAS"):
        try:
            run_pl, arrays_pl, _ = _build(use_pallas=True)
            tp_pallas, _ = throughput(run_pl, arrays_pl, batch=128)
        except Exception as e:
            print(f"# pallas path failed: {type(e).__name__}: {e}", flush=True)

    best_batch = max(per_batch, key=lambda b: per_batch[b])
    images_per_sec = per_batch[best_batch]
    dev_ips = best_batch / dev_per_batch[best_batch]
    macs = conv_macs_per_image(program)
    p50 = latency_batch1(run, arrays)
    dev_lat = latency_batch1_device(run, arrays)
    result = {
        "metric": "yolov3-tiny uint8 416x416 inference throughput (1 chip)",
        "value": round(images_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMG_PER_SEC, 1),
        "batch": best_batch,
        "device_images_per_sec": round(dev_ips, 1),
        "device_ms_per_batch": round(1e3 * dev_per_batch[best_batch], 3),
        "mfu_int8": round(2.0 * macs * dev_ips / V5E_INT8_TOPS, 4),
        "conv_gmacs_per_image": round(macs / 1e9, 3),
        "p50_latency_batch1_ms": round(p50 * 1e3, 3),
        "device_latency_batch1_ms": round(dev_lat * 1e3, 3),
        "images_per_sec_by_batch": {str(k): round(v, 1) for k, v in per_batch.items()},
        "conv_path": "xla",
        "device": str(jax.devices()[0]),
    }
    if tp_pallas is not None:
        result["images_per_sec_pallas"] = round(tp_pallas, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
