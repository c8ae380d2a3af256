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
        (52, 16, 32, 3, 1, ACT_RELU6),    # multiple row tiles
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
