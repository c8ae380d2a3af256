"""Whole-backbone conv-chain benchmark in ONE jit: XLA vs Pallas variants.

Per-layer microbenches (bench_layers.py) are dispatch-floor-bound on the
tunneled dev TPU (~1.3 ms/call), so they can't see kernel-level differences.
This chains the yolov3-tiny backbone (conv[+pool] stages) inside a single
jitted program per variant and times the whole chain amortized:

  xla          lax.conv-based quantized_conv2d + maxpool_u8
  pallas       Pallas conv (no pool fusion) + maxpool_u8
  pallas+fuse  Pallas conv with the fused-pool epilogue

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_chain.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

from yolo_quantization_tpu.nn.layers import maxpool_u8
from yolo_quantization_tpu.ops.pallas_qconv import pallas_quantized_conv2d
from yolo_quantization_tpu.ops.qconv import ACT_RELU6, quantized_conv2d

# (Cin, Cout, K, pool) backbone stages at 416 input; stem (ci=3) excluded —
# the engine always routes it to XLA (see infer/engine._pallas_eligible)
STAGES = [
    (16, 32, 3, True),
    (32, 64, 3, True),
    (64, 128, 3, True),
    (128, 256, 3, True),
    (256, 512, 3, False),  # the following pool is stride-1 (13x13 stays)
    (512, 1024, 3, False),
    (1024, 256, 1, False),
    (256, 512, 3, False),
]


def build(variant: str):
    def chain(x, weights):
        for (ci, co, k, pool), w in zip(STAGES, weights):
            bias = jnp.zeros((co,), jnp.int32)
            m = jnp.full((co,), 1e-3, jnp.float32)
            zp = jnp.int32(0)
            pad = k // 2
            if variant == "xla":
                x = quantized_conv2d(x, w, bias, m, zp, jnp.zeros((co,), jnp.int32),
                                     jnp.int32(3), stride=1, pad=pad,
                                     act=ACT_RELU6, symmetric=True)
                if pool:
                    x = maxpool_u8(x, 2, 2, 1)
            else:
                fuse = pool and variant == "pallas+fuse"
                x = pallas_quantized_conv2d(x, w, bias, m, zp, stride=1, pad=pad,
                                            act=ACT_RELU6, out_zp_static=3,
                                            fuse_pool=fuse)
                if pool and not fuse:
                    x = maxpool_u8(x, 2, 2, 1)
        return jnp.sum(x.astype(jnp.int32))

    return jax.jit(chain)


def main(batch=32):
    key = jax.random.PRNGKey(0)
    x0 = jax.jit(lambda kk: jax.random.randint(
        kk, (batch, 208, 208, 16), 0, 256, jnp.int32).astype(jnp.uint8))(key)
    weights = [
        jax.jit(lambda kk, k=k, ci=ci, co=co: jax.random.randint(
            kk, (k, k, ci, co), -127, 128, jnp.int32).astype(jnp.int8))(key)
        for (ci, co, k, _) in STAGES
    ]
    for variant in ("xla", "pallas", "pallas+fuse"):
        fn = build(variant)
        try:
            float(fn(x0, weights))  # compile + warm
        except Exception as e:
            print(f"{variant:12s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        t0 = time.perf_counter()
        r = None
        for _ in range(20):
            r = fn(x0, weights)
        float(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{variant:12s}: {dt*1e3:8.3f} ms/batch  {batch/dt:8.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
