"""Pallas fused conv kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_quantization_tpu.ops.pallas_qconv import pallas_quantized_conv2d
from yolo_quantization_tpu.ops.qconv import (
    ACT_LEAKY,
    ACT_LINEAR,
    ACT_RELU6,
    quantized_conv2d,
)


def make_inputs(rng, n=1, h=13, ci=32, co=64, k=3):
    x = rng.integers(0, 256, (n, h, h, ci), dtype=np.uint8)
    w = rng.integers(-127, 128, (k, k, ci, co)).astype(np.int8)
    bias = rng.integers(-(2**14), 2**14, (co,)).astype(np.int32)
    m = rng.uniform(1e-4, 5e-3, (co,)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), jnp.asarray(m)


@pytest.mark.parametrize(
    "h,ci,co,k,pad,act",
    [
        (13, 32, 64, 3, 1, ACT_LEAKY),
        (13, 256, 30, 1, 0, ACT_LINEAR),
        (26, 16, 48, 3, 1, ACT_RELU6),
        (20, 8, 130, 3, 1, ACT_LINEAR),   # co > lane tile -> 2 channel tiles
        (52, 16, 32, 3, 1, ACT_RELU6),
        (72, 8, 16, 3, 1, ACT_LINEAR),    # partial last row tile (72 % 56 != 0)
        (96, 12, 24, 3, 1, ACT_LEAKY),    # multiple row tiles w/ partial tail
    ],
)
def test_matches_xla_path(rng, h, ci, co, k, pad, act):
    x, w, bias, m = make_inputs(rng, h=h, ci=ci, co=co, k=k)
    x_zp = jnp.int32(7)
    out_zp = 111
    ref = quantized_conv2d(
        x, w, bias, m, x_zp, jnp.zeros((co,), jnp.int32), jnp.int32(out_zp),
        stride=1, pad=pad, act=act, symmetric=True,
    )
    got = pallas_quantized_conv2d(
        x, w, bias, m, x_zp,
        stride=1, pad=pad, act=act, out_zp_static=out_zp, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_batch_dimension(rng):
    x, w, bias, m = make_inputs(rng, n=3, h=13, ci=16, co=32)
    x_zp = jnp.int32(-3)
    ref = quantized_conv2d(
        x, w, bias, m, x_zp, jnp.zeros((32,), jnp.int32), jnp.int32(90),
        stride=1, pad=1, act=ACT_LEAKY, symmetric=True,
    )
    got = pallas_quantized_conv2d(
        x, w, bias, m, x_zp, stride=1, pad=1, act=ACT_LEAKY,
        out_zp_static=90, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("h", [16, 72])  # 72: partial row tiles
def test_fused_pool_matches_conv_then_pool(rng, h):
    from yolo_quantization_tpu.nn.layers import maxpool_u8

    x, w, bias, m = make_inputs(rng, h=h, ci=16, co=32, k=3)
    x_zp = jnp.int32(5)
    conv = pallas_quantized_conv2d(
        x, w, bias, m, x_zp, stride=1, pad=1, act=ACT_LEAKY,
        out_zp_static=100, interpret=True,
    )
    pooled_ref = maxpool_u8(conv, 2, 2, 1)
    fused = pallas_quantized_conv2d(
        x, w, bias, m, x_zp, stride=1, pad=1, act=ACT_LEAKY,
        out_zp_static=100, fuse_pool=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(pooled_ref))


def test_engine_fusion_plan_bit_identical(rng):
    """Engine with conv+pool fusion gives identical heads to the XLA path."""
    from yolo_quantization_tpu.infer.engine import Engine, build_forward
    from yolo_quantization_tpu.models.presets import flagship_program

    prog = flagship_program(classes=5, size=64)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    import jax

    arrays = jax.device_put(prog.arrays)
    ref = build_forward(prog, use_pallas=False)(arrays, jnp.asarray(x))
    got = build_forward(prog, use_pallas=True, pallas_interpret=True)(
        arrays, jnp.asarray(x)
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # layers 0,2,4,6 fusable; 8 is route-referenced, 10's pool is stride 1
    assert 8 not in _engine_plan(prog)
    assert {0, 2, 4, 6} <= set(_engine_plan(prog))


def _engine_plan(prog):
    from yolo_quantization_tpu.nn.graph import MaxPoolSpec, RouteSpec, ShortcutSpec

    def referenced(i):
        for spec in prog.net.specs:
            if isinstance(spec, RouteSpec) and i in spec.layers:
                return True
            if isinstance(spec, ShortcutSpec) and spec.index == i:
                return True
        return False

    plan = set()
    for i, c in enumerate(prog.cfg[:-1]):
        nxt = prog.cfg[i + 1].spec
        if (c.kind == "qconv" and c.symmetric_w and not c.quant_stop
                and c.spec.stride == 1 and isinstance(nxt, MaxPoolSpec)
                and nxt.size == 2 and nxt.stride == 2 and nxt.padding == 1
                and not referenced(i)):
            plan.add(i)
    return plan
