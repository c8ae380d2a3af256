"""Probe: MXU cost of the two GEMM orientations for small-channel convs.

The stem conv (416²×3→16, K=27) can be formulated two ways on the MXU:

  A. rows = pixels  : (P, K) x (K, O)  — output pixels on sublanes, O on
                      lanes (the engine's NHWC formulation; O=16 wastes
                      7/8 of the lanes, K=27 wastes 3/4 of the contraction)
  B. pixels on lanes: (O, K) x (K, P)  — weights-stationary; P streams on
                      the lane dim 128 at a time, O=16 on sublanes

plus C: the same as A but with 4x-channel s2d blocking (P/4, 4K) x (4K, 4O).

This measures pure dot throughput in Pallas (data resident in VMEM, grid
over tiles) to decide whether a hand kernel can beat XLA's stem conv
(~2.15 ms at batch 128, docs/perf.md) before investing in im2col plumbing.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, *args, iters=30):
    # NOTE: jax.block_until_ready does NOT actually wait on the tunneled
    # axon device; force real execution by fetching a scalar (bench.py
    # pattern), else numbers come out impossibly fast.
    force = jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)))
    float(force(fn(*args)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(force(out))
    return (time.perf_counter() - t0) / iters


def orientation_a(rows_total: int, k: int, o: int, tile_rows: int = 4096):
    """(tile_rows, k) x (k, o) per grid step."""
    def kernel(x_ref, w_ref, out_ref):
        out_ref[:] = lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)

    n_tiles = rows_total // tile_rows
    x = jnp.ones((rows_total, k), jnp.int8)
    w = jnp.ones((k, o), jnp.int8)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_rows, o), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_total, o), jnp.int8),
        )(x, w)

    return run, (x, w)


def orientation_b(rows_total: int, k: int, o: int, tile_p: int = 4096):
    """(o, k) x (k, tile_p) per grid step — pixels on lanes."""
    def kernel(w_ref, x_ref, out_ref):
        out_ref[:] = lax.dot_general(
            w_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)

    n_tiles = rows_total // tile_p
    x = jnp.ones((k, rows_total), jnp.int8)
    w = jnp.ones((o, k), jnp.int8)

    @jax.jit
    def run(w, x):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((o, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tile_p), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((o, tile_p), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((o, rows_total), jnp.int8),
        )(w, x)

    return run, (w, x)


def main():
    # stem-equivalent totals at batch 128: 416^2 x 128 output pixels
    rows_total = 416 * 416 * 128 // 8  # probe 1/8 of the full load, scale up
    cases = [
        ("A rows=pixels  K=32  O=16", orientation_a, 32, 16),
        ("A rows=pixels  K=128 O=64 (s2d)", orientation_a, 128, 64),
        ("B pixels=lanes K=32  O=16", orientation_b, 32, 16),
        ("B pixels=lanes K=128 O=64 (s2d, P/4)", None, 128, 64),
    ]
    for name, builder, k, o in cases:
        rt = rows_total // 4 if "P/4" in name else rows_total
        b = builder or orientation_b
        try:
            run, args = b(rt, k, o)
            dt = _time(run, *args)
            # scale to the full stem load
            scale = 8 * (rows_total / rt) / (4 if "s2d" in name else 1)
            print(f"{name}: {dt*1e3:7.3f} ms/probe -> {dt*scale*1e3:7.2f} ms full-stem-equiv")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
