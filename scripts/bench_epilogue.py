"""Microbench: stem conv+pool chain with the current vs a leaner epilogue.

The r2 trace put 69% of device time in the small-channel stem, bound by the
requant epilogue's VPU ops + the u8 HBM round-trips (docs/perf.md).  Variant
E1 folds the int32 bias add and the zero-point add into ONE precomputed f32
constant per channel:

    current: v = round((acc + bias_i32)*m);  out = clip(v + zp, lo, hi)
    E1:      bf = f64(bias_i32)*m + zp  (host, f64->f32)
             out = clip(round(acc*m + bf), lo, hi)

round(x)+zp == round(x+zp) exactly for integral zp while x*m+bf keeps one
rounding via the VPU's FMA, so E1 differs from the current spec by at most
1 LSB on ties (measured below).  This run answers whether the 2-3 saved VPU
ops per element are worth a spec change.

Also times the full flagship graph at batch 128 vs 256 (fusion/overhead
amortization check).

Usage: python scripts/bench_epilogue.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_quantization_tpu.nn import layers as L
from yolo_quantization_tpu.ops import qconv


def make_stem(batch: int, lean: bool):
    """conv0(3->16)+pool + conv2(16->32)+pool + conv4(32->64)+pool @416."""
    rng = np.random.default_rng(0)
    layers = []
    cin = 3
    for cout in (16, 32, 64):
        w = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
        bias = rng.integers(-2000, 2000, cout).astype(np.int32)
        m = (rng.uniform(0.002, 0.02, cout)).astype(np.float32)
        layers.append((w, bias, m, np.int32(-121), np.int32(7)))
        cin = cout

    def run(x):
        s = 0.0
        for (w, bias, m, x_zp, out_zp) in layers:
            acc = qconv.conv_acc_int32(
                x, jnp.asarray(w), jnp.asarray(x_zp), None, 1, 1, symmetric=True
            )
            if lean:
                bf = jnp.asarray(
                    (bias.astype(np.float64) * m.astype(np.float64)
                     + float(out_zp) - 128.0).astype(np.float32)
                )
                v = jnp.round(acc.astype(jnp.float32) * jnp.asarray(m) + bf)
                lo = float(max(int(out_zp) - 128, -128))  # relu fold
                y = jnp.clip(v, lo, 127.0).astype(jnp.int8)
            else:
                y = qconv.requant_activate(
                    acc, jnp.asarray(bias), jnp.asarray(m), jnp.asarray(out_zp),
                    qconv.ACT_RELU6, out_i8=True,
                )
            y = L.maxpool_u8(y, 2, 2, 1)
            x = y
        return jnp.sum(y.astype(jnp.int32))

    return jax.jit(run)


def time_chain(fn, x, chain=30):
    float(fn(x))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn(x)
        float(out)
        dt = (time.perf_counter() - t0) / chain
        best = dt if best is None else min(best, dt)
    return best


def main():
    batch = 128
    x = jax.jit(
        lambda k: jax.random.randint(k, (batch, 416, 416, 3), -128, 128, jnp.int8)
    )(jax.random.PRNGKey(0))
    for lean in (False, True):
        fn = make_stem(batch, lean)
        dt = time_chain(fn, x)
        print(json.dumps({
            "bench": "stem3+pools", "lean_epilogue": lean, "batch": batch,
            "ms": round(1e3 * dt, 3),
        }), flush=True)

    # exactness probe: compare codes across the two epilogues on one layer
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.integers(-128, 128, (2, 64, 64, 16)).astype(np.int8))
    w = rng.integers(-127, 128, (3, 3, 16, 32)).astype(np.int8)
    bias = rng.integers(-2000, 2000, 32).astype(np.int32)
    m = rng.uniform(0.002, 0.02, 32).astype(np.float32)
    acc = qconv.conv_acc_int32(xs, jnp.asarray(w), jnp.int32(-121), None, 1, 1, True)
    cur = qconv.requant_activate(
        acc, jnp.asarray(bias), jnp.asarray(m), jnp.int32(7), qconv.ACT_RELU6,
        out_i8=True,
    )
    bf = jnp.asarray((bias.astype(np.float64) * m.astype(np.float64) + 7 - 128.0
                      ).astype(np.float32))
    v = jnp.round(acc.astype(jnp.float32) * jnp.asarray(m) + bf)
    lean_y = jnp.clip(v, float(7 - 128), 127.0).astype(jnp.int8)
    diff = np.abs(np.asarray(cur, np.int32) - np.asarray(lean_y, np.int32))
    print(json.dumps({
        "bench": "epilogue_divergence", "max_lsb": int(diff.max()),
        "frac_diff": float((diff > 0).mean()),
    }), flush=True)

    # full graph batch sweep
    from yolo_quantization_tpu.eval import detect
    from yolo_quantization_tpu.infer.engine import build_forward
    from yolo_quantization_tpu.models.presets import flagship_program

    program = flagship_program()
    fwd = build_forward(program)
    arrays = jax.device_put(program.arrays)
    net = program.net

    @jax.jit
    def full(arrays, x):
        heads = fwd(arrays, x)
        b, o, c = detect.decode_all_heads(heads, net)
        b, o, c = detect.top_k_detections(b, o, c, 64)
        return jnp.sum(o)

    for b in (128, 256):
        xb = jax.jit(
            lambda k: jax.random.uniform(k, (b, 416, 416, 3), jnp.float32)
        )(jax.random.PRNGKey(0))
        dt = time_chain(lambda t: full(arrays, t), xb, chain=20)
        print(json.dumps({
            "bench": "full_graph", "batch": b, "ms": round(1e3 * dt, 3),
            "images_per_sec": round(b / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
