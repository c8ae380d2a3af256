"""Pallas s2d phase-max stem kernel == the XLA s2d acc-max path, bitwise.

The kernel (ops/pallas_qconv.pallas_s2d_conv_phase_max) fuses the
space-to-depth block conv, the 4-phase max on int32 accumulators, and the
requant epilogue in VMEM — the stem fusion XLA cannot express (docs/perf.md
round 3).  Interpret mode runs the same kernel logic on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_quantization_tpu.infer.convert import _s2d_weights
from yolo_quantization_tpu.ops import qconv
from yolo_quantization_tpu.ops.pallas_qconv import pallas_s2d_conv_phase_max


def _case(rng, n, h, w, ci, co):
    """Random stem stage in s2d space; returns inputs + the XLA reference."""
    x = rng.integers(-128, 128, (n, h, w, ci)).astype(np.int8)
    w_orig = rng.integers(-127, 128, (3, 3, ci, co)).astype(np.int8)
    bias = rng.integers(-4000, 4000, co).astype(np.int32)
    m = rng.uniform(0.002, 0.03, co).astype(np.float32)
    x_zp = np.int32(rng.integers(-128, 0))
    out_zp = int(rng.integers(0, 32))

    # s2d transform of input and weights
    xs = x.reshape(n, h // 2, 2, w // 2, 2, ci)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * ci)
    w_s2d = _s2d_weights(w_orig)
    return x, xs, w_s2d, w_orig, bias, m, x_zp, out_zp


@pytest.mark.parametrize(
    "n,h,w,ci,co,act",
    [
        (1, 16, 16, 3, 16, qconv.ACT_RELU6),   # conv0-shaped
        (2, 20, 28, 16, 32, qconv.ACT_LEAKY),  # conv2-shaped, non-square
        (1, 12, 20, 32, 64, qconv.ACT_LINEAR), # conv4-shaped
        (1, 52, 52, 3, 16, qconv.ACT_RELU6),   # W2=26 > one row tile case
    ],
)
def test_phase_max_kernel_bit_identical(rng, n, h, w, ci, co, act):
    x, xs, w_s2d, w_orig, bias, m, x_zp, out_zp = _case(rng, n, h, w, ci, co)

    # XLA reference: the engine's s2d acc-max formula
    acc = qconv.conv_acc_int32(
        jnp.asarray(xs), jnp.asarray(w_s2d), jnp.int32(x_zp), None,
        stride=1, pad=1, symmetric=True,
    )
    o4 = acc.shape[-1] // 4
    accm = jnp.minimum(jnp.asarray(2**31 - 1), jnp.maximum(
        jnp.maximum(acc[..., :o4], acc[..., o4 : 2 * o4]),
        jnp.maximum(acc[..., 2 * o4 : 3 * o4], acc[..., 3 * o4 :]),
    ))
    want = qconv.requant_activate(
        accm, jnp.asarray(bias), jnp.asarray(m), jnp.int32(out_zp), act,
        out_i8=True,
    )

    got = pallas_s2d_conv_phase_max(
        jnp.asarray(xs), jnp.asarray(w_s2d), jnp.asarray(bias), jnp.asarray(m),
        jnp.int32(x_zp), act=act, out_zp_static=out_zp, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_phase_max_equals_conv_then_pool(rng):
    """End-to-end check vs the ORIGINAL space conv -> requant -> maxpool."""
    from yolo_quantization_tpu.nn import layers as L

    n, h, w, ci, co = 1, 24, 24, 8, 16
    x, xs, w_s2d, w_orig, bias, m, x_zp, out_zp = _case(rng, n, h, w, ci, co)
    y_conv = qconv.quantized_conv2d(
        jnp.asarray(x), jnp.asarray(w_orig), jnp.asarray(bias), jnp.asarray(m),
        jnp.int32(x_zp), jnp.zeros(co, jnp.int32), jnp.int32(out_zp),
        stride=1, pad=1, act=qconv.ACT_RELU6, symmetric=True, out_i8=True,
    )
    want = L.maxpool_u8(y_conv, 2, 2, 1)
    got = pallas_s2d_conv_phase_max(
        jnp.asarray(xs), jnp.asarray(w_s2d), jnp.asarray(bias), jnp.asarray(m),
        jnp.int32(x_zp), act=qconv.ACT_RELU6, out_zp_static=out_zp,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
