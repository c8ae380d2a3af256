"""Once-per-round correctness checks on the REAL TPU backend.

The CI suite runs on the CPU backend (tests/conftest.py); integer convs and
rounding can lower differently per backend, so these checks re-run the
bit-identity claims where they actually matter (ADVICE r2 item 2):

  1. int16 carrier == int8 carrier on a full quantized conv (the MKL
     s16s16s32 analog, src/convolutional_layer.c:528-605)
  2. engine forward on TPU == engine forward on CPU, byte-for-byte, on the
     flagship graph at a reduced size (96) — covers conv/pool/route/upsample
     integer semantics across backends
  3. dynamic-input mode == ctwin.dynamic_input_qp per-image params (<=1 ulp
     scale; codes <=1 LSB)

Usage: python scripts/tpu_checks.py   (prints one JSON line; exit 0 = pass)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

checks = {}


def check_int16_carrier():
    from yolo_quantization_tpu.ops.qconv import quantized_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (2, 40, 40, 16)).astype(np.int8))
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 32)).astype(np.int8))
    bias = jnp.asarray(rng.integers(-3000, 3000, 32).astype(np.int32))
    m = jnp.asarray(rng.uniform(0.002, 0.02, 32).astype(np.float32))
    w_zp = jnp.asarray(rng.integers(-20, 20, 32).astype(np.int32))
    kw = dict(stride=1, pad=1, act=1, symmetric=False, out_i8=True)
    a = quantized_conv2d(x, w, bias, m, jnp.int32(-7), w_zp, jnp.int32(9), **kw)
    b = quantized_conv2d(x, w, bias, m, jnp.int32(-7), w_zp, jnp.int32(9),
                         carrier="int16", **kw)
    same = bool((np.asarray(a) == np.asarray(b)).all())
    checks["int16_carrier_bit_identical_on_tpu"] = same
    return same


def check_engine_cpu_vs_tpu():
    from yolo_quantization_tpu.infer.engine import build_forward
    from yolo_quantization_tpu.models.presets import flagship_program

    program = flagship_program(classes=3, size=96)
    fwd = build_forward(program, return_outputs=True)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    outs = {}
    for name, dev in (("cpu", cpu), ("tpu", tpu)):
        with jax.default_device(dev):
            arrays = jax.device_put(program.arrays, dev)
            _, layer_outs = jax.jit(fwd)(arrays, jnp.asarray(x))
            outs[name] = [np.asarray(o) for o in layer_outs]
    worst = 0
    for a, b in zip(outs["cpu"], outs["tpu"]):
        if a.dtype == np.int8:
            worst = max(worst, int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max()))
    checks["engine_cpu_vs_tpu_max_lsb"] = worst
    return worst == 0


def check_dynamic_qp():
    from yolo_quantization_tpu.infer.engine import (
        _dynamic_input_qp,
        _quantize_input_dynamic,
    )
    from yolo_quantization_tpu.parity import ctwin

    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    scales, zps = jax.jit(_dynamic_input_qp)(imgs)
    codes = np.asarray(
        jax.jit(_quantize_input_dynamic)(imgs, scales, zps)
    ).astype(np.int16) + 128
    ok = True
    max_code_diff = 0
    for i in range(len(imgs)):
        s_ref, zp_ref = ctwin.dynamic_input_qp(imgs[i])
        ok &= abs(float(scales[i]) - float(s_ref)) <= float(np.spacing(s_ref))
        ok &= abs(int(zps[i]) - zp_ref) <= 1
        ref = ctwin.quantize_input_c(imgs[i], s_ref, zp_ref)
        max_code_diff = max(
            max_code_diff,
            int(np.abs(codes[i] - ref.astype(np.int16)).max()),
        )
    ok &= max_code_diff <= 1
    checks["dynamic_qp_matches_ctwin"] = bool(ok)
    checks["dynamic_qp_max_code_diff"] = max_code_diff
    return ok


def main():
    results = [check_int16_carrier(), check_engine_cpu_vs_tpu(), check_dynamic_qp()]
    checks["device"] = str(jax.devices()[0])
    checks["ok"] = bool(all(results))
    print(json.dumps(checks))
    sys.exit(0 if checks["ok"] else 1)


if __name__ == "__main__":
    main()
