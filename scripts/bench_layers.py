"""Per-layer conv microbenchmark on the current device (XLA vs Pallas).

Profiles every conv configuration of yolov3-tiny at the flagship 416 input,
amortized-timing both paths, to guide kernel tuning.  Run on TPU:

    python scripts/bench_layers.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from yolo_quantization_tpu.ops.pallas_qconv import pallas_quantized_conv2d
from yolo_quantization_tpu.ops.qconv import ACT_RELU6, quantized_conv2d


def amortized(fn, *args, chain=20):
    out = fn(*args)
    jnp.sum(out.astype(jnp.int32)).block_until_ready()
    r = None
    t0 = time.perf_counter()
    for _ in range(chain):
        r = fn(*args)
    float(jnp.sum(r.astype(jnp.int32)))
    return (time.perf_counter() - t0) / chain


def main(batch=32):
    layers = [  # (H, Cin, Cout, K) — yolov3-tiny at 416
        (416, 3, 16, 3), (208, 16, 32, 3), (104, 32, 64, 3), (52, 64, 128, 3),
        (26, 128, 256, 3), (13, 256, 512, 3), (13, 512, 1024, 3),
        (13, 1024, 256, 1), (13, 256, 512, 3), (13, 512, 30, 1),
        (13, 256, 128, 1), (26, 384, 256, 3), (26, 256, 30, 1),
    ]
    key = jax.random.PRNGKey(0)
    print(f"batch={batch}")
    tot_x = tot_p = 0.0
    for (h, ci, co, k) in layers:
        pad = k // 2
        x = jax.jit(lambda kk: jax.random.randint(
            kk, (batch, h, h, ci), 0, 256, jnp.int32).astype(jnp.uint8))(key)
        w = jax.jit(lambda kk: jax.random.randint(
            kk, (k, k, ci, co), -127, 128, jnp.int32).astype(jnp.int8))(key)
        bias = jnp.zeros((co,), jnp.int32)
        m = jnp.full((co,), 1e-3, jnp.float32)
        zp = jnp.int32(0)

        def xla_fn(x, w, bias, m):
            return quantized_conv2d(x, w, bias, m, zp, jnp.zeros((co,), jnp.int32),
                                    jnp.int32(3), stride=1, pad=pad,
                                    act=ACT_RELU6, symmetric=True)

        def pl_fn(x, w, bias, m):
            return pallas_quantized_conv2d(x, w, bias, m, zp, stride=1, pad=pad,
                                           act=ACT_RELU6, out_zp_static=3)

        tx = amortized(jax.jit(xla_fn), x, w, bias, m)
        tot_x += tx
        macs = batch * h * h * co * k * k * ci
        try:
            tp = amortized(jax.jit(pl_fn), x, w, bias, m)
        except Exception as e:  # e.g. the ci=3 stem blows scoped VMEM
            print(f"{h:4d}x{ci:4d}->{co:4d} k{k}: xla {tx*1e3:7.3f} ms "
                  f"({macs*2/tx/1e12:6.1f} TOPS)  pallas SKIP "
                  f"({type(e).__name__})", flush=True)
            tot_p += tx  # engine falls back to XLA for this layer
            continue
        tot_p += tp
        print(f"{h:4d}x{ci:4d}->{co:4d} k{k}: xla {tx*1e3:7.3f} ms "
              f"({macs*2/tx/1e12:6.1f} TOPS)  pallas {tp*1e3:7.3f} ms "
              f"({macs*2/tp/1e12:6.1f} TOPS)", flush=True)
    print(f"TOTAL conv: xla {tot_x*1e3:.2f} ms  pallas {tot_p*1e3:.2f} ms "
          f"-> {batch/tot_x:.0f} vs {batch/tot_p:.0f} img/s conv-only")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
