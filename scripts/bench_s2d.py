"""Measure the s2d phase-max stem path vs the plain XLA path on the chip.

The r3 restructure takes the stem's 2x2/s2 maxpool as a phase max on the
int32 conv accumulators BEFORE the requant epilogue (engine.py s2d branch) —
the r2 form requantized first and pooled codes, leaving the epilogue on 4x
elements (the measured VPU bound, docs/perf.md).  This script answers: does
XLA keep the max inside the conv's consumer fusion, and what does it buy
end-to-end?

Usage: python scripts/bench_s2d.py [batch] [chain]
Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build(use_s2d: bool):
    from yolo_quantization_tpu.eval import detect
    from yolo_quantization_tpu.infer.engine import build_forward
    from yolo_quantization_tpu.models.presets import flagship_program

    program = flagship_program()
    fwd = build_forward(program, use_s2d=use_s2d)
    arrays = jax.device_put(program.arrays)
    net = program.net

    @jax.jit
    def run(arrays, x):
        heads = fwd(arrays, x)
        boxes, obj, cls = detect.decode_all_heads(heads, net)
        boxes, obj, cls = detect.top_k_detections(boxes, obj, cls, 64)
        return jnp.sum(obj)

    return run, arrays


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    x = jax.jit(
        lambda k: jax.random.uniform(k, (batch, 416, 416, 3), jnp.float32)
    )(jax.random.PRNGKey(0))
    results = {}
    for name, use_s2d in (("plain", False), ("s2d_accmax", True)):
        run, arrays = build(use_s2d)
        t0 = time.perf_counter()
        v0 = float(run(arrays, x))  # compile + warm
        compile_s = time.perf_counter() - t0
        # two timed chains; keep the better (tunnel noise)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(chain):
                out = run(arrays, x)
            float(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ips = chain * batch / best
        results[name] = ips
        print(json.dumps({
            "variant": name, "batch": batch, "images_per_sec": round(ips, 1),
            "ms_per_batch": round(1e3 * best / chain, 3),
            "compile_s": round(compile_s, 1), "check": v0,
        }), flush=True)
    if len(results) == 2:
        print(json.dumps({
            "speedup_s2d": round(results["s2d_accmax"] / results["plain"], 3)
        }))


if __name__ == "__main__":
    main()
