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


def bench_kernels(batch: int, chain: int = 20):
    """Per-stage: Pallas s2d phase-max kernel vs the XLA conv+pool pair on
    the three real stem shapes (docs/perf.md round 3 predicted the Pallas
    row-pass cost; this measures it)."""
    import numpy as np

    from yolo_quantization_tpu.nn import layers as L
    from yolo_quantization_tpu.ops import qconv
    from yolo_quantization_tpu.ops.pallas_qconv import pallas_s2d_conv_phase_max
    from yolo_quantization_tpu.infer.convert import _s2d_weights

    rng = np.random.default_rng(0)
    stages = [  # (H, W, Ci, Co) in ORIGINAL space
        ("conv0+pool1", 416, 416, 3, 16),
        ("conv2+pool3", 208, 208, 16, 32),
        ("conv4+pool5", 104, 104, 32, 64),
    ]
    for name, h, w, ci, co in stages:
        w_orig = rng.integers(-127, 128, (3, 3, ci, co)).astype(np.int8)
        bias = jnp.asarray(rng.integers(-4000, 4000, co).astype(np.int32))
        m = jnp.asarray(rng.uniform(0.002, 0.03, co).astype(np.float32))
        x_zp, out_zp = jnp.int32(-121), 7
        w_s2d = jnp.asarray(_s2d_weights(w_orig))
        wj = jnp.asarray(w_orig)

        x = jax.jit(lambda k: jax.random.randint(
            k, (batch, h, w, ci), -128, 128, jnp.int8))(jax.random.PRNGKey(1))
        xs = jax.jit(lambda t: t.reshape(batch, h // 2, 2, w // 2, 2, ci)
                     .transpose(0, 1, 3, 2, 4, 5)
                     .reshape(batch, h // 2, w // 2, 4 * ci))(x)

        @jax.jit
        def xla_pair(t):
            y = qconv.quantized_conv2d(
                t, wj, bias, m, x_zp, jnp.zeros(co, jnp.int32),
                jnp.int32(out_zp), stride=1, pad=1, act=qconv.ACT_RELU6,
                symmetric=True, out_i8=True,
            )
            return jnp.sum(L.maxpool_u8(y, 2, 2, 1).astype(jnp.int32))

        @jax.jit
        def pallas_stage(t):
            y = pallas_s2d_conv_phase_max(
                t, w_s2d, bias, m, x_zp, act=qconv.ACT_RELU6,
                out_zp_static=out_zp,
            )
            return jnp.sum(y.astype(jnp.int32))

        row = {"stage": name, "batch": batch}
        for label, fn, arg in (("xla_ms", xla_pair, x), ("pallas_s2d_ms", pallas_stage, xs)):
            try:
                v = float(fn(arg))
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = None
                    for _ in range(chain):
                        out = fn(arg)
                    float(out)
                    dt = (time.perf_counter() - t0) / chain
                    best = dt if best is None else min(best, dt)
                row[label] = round(1e3 * best, 3)
                row[label.replace("_ms", "_check")] = v
            except Exception as e:
                row[label] = f"error: {type(e).__name__}: {e}"[:160]
        print(json.dumps(row), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "kernels":
        bench_kernels(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
        return
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
