"""Float-domain layer primitives (NHWC), shared by QAT training and float eval.

These are the float counterparts of the reference's layer forwards
(src/convolutional_layer.c:802-848, src/maxpool_layer.c:174-217,
src/upsample_layer.c, src/shortcut_layer.c), re-expressed as pure jittable
functions in TPU-native NHWC layout.  Quantized-domain inference variants live
in ops/ and infer/engine.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-6  # reference adds 1e-6 to sqrt(var), src/blas.c:576


def activate(x: jax.Array, name: str) -> jax.Array:
    """darknet activations used by the YOLO family (src/activations.h:39-41)."""
    if name == "linear":
        return x
    if name == "leaky":
        return jnp.where(x > 0, x, 0.1 * x)
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "logistic":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {name!r}")


def conv2d(x: jax.Array, w: jax.Array, stride: int, pad: int) -> jax.Array:
    """Plain float conv, NHWC x HWIO -> NHWC, darknet symmetric padding."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )


def bn_inference_scale_bias(gamma, beta, mean, var):
    """Fold BN running stats into a per-channel (scale, bias) pair.

    y = gamma * (x - mean) / (sqrt(var) + eps) + beta
    Matches the reference's fold (src/blas.c:582-601): note the denominator is
    sqrt(var) + eps, NOT sqrt(var + eps).
    """
    inv = gamma / (jnp.sqrt(var) + BN_EPS)
    return inv, beta - mean * inv


def fold_bn_into_weights(w, bias, gamma, beta, mean, var):
    """Return (w_folded, bias_folded) for conv-then-BN collapse.

    w is HWIO; the fold scales each output channel: w' = w * gamma/(sqrt(var)+eps),
    b' = beta - gamma*mean/(sqrt(var)+eps) (+ the conv's own bias scaled in —
    darknet conv layers with BN reuse .biases as BN beta, so ``bias`` here IS
    beta and there is no separate conv bias; we keep the argument for clarity).
    Reference: src/blas.c:582-601 batch_normalize_weights / batch_normalize_bias.
    """
    inv = gamma / (jnp.sqrt(var) + BN_EPS)
    w_folded = w * inv.reshape(1, 1, 1, -1)
    bias_folded = beta - mean * inv
    del bias
    return w_folded, bias_folded


def batch_stats(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel mean/variance over (N, H, W) of an NHWC tensor.

    darknet's variance_cpu divides by (batch*spatial - 1)? No — it divides by
    (batch * spatial), biased, src/blas.c mean/variance kernels; we match jnp
    default (biased) which is what jnp.var computes.
    """
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return mean, var


def maxpool_padding(h: int, size: int, stride: int, pad: int) -> tuple[int, int, int]:
    """darknet maxpool geometry: out = (h + pad - size)//stride + 1, window
    origin offset -pad//2 (src/maxpool_layer.c:22-37,112-115).

    Returns (out_h, pad_lo, pad_hi) where pad_lo/pad_hi are the explicit
    amounts to pad so a VALID reduce_window reproduces the darknet layout.
    """
    out = (h + pad - size) // stride + 1
    pad_lo = pad // 2
    pad_hi = max(0, (out - 1) * stride + size - pad_lo - h)
    return out, pad_lo, pad_hi


def maxpool(x: jax.Array, size: int, stride: int, pad: int) -> jax.Array:
    """Float maxpool with darknet geometry; pads with -inf."""
    _, lo, hi = maxpool_padding(x.shape[1], size, stride, pad)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
    )


def maxpool_u8(x_u8: jax.Array, size: int, stride: int, pad: int) -> jax.Array:
    """uint8 maxpool — max is scale-invariant so it runs directly on codes.

    Pads with code 0, matching the reference quant pool's effective padding
    (src/maxpool_layer.c:109-147: invalid taps contribute 0 to a uint8 max).
    """
    _, lo, hi = maxpool_padding(x_u8.shape[1], size, stride, pad)
    return lax.reduce_window(
        x_u8,
        jnp.uint8(0),
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
    )


def upsample_nearest(x: jax.Array, stride: int) -> jax.Array:
    """Nearest-neighbor upsample by integer stride (src/blas.c:781-803).

    Works on any dtype (including uint8 codes — value-preserving, so quant
    params pass through unchanged, reference src/upsample_layer.c:96-113).
    """
    return jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)


def route_concat(tensors: list[jax.Array]) -> jax.Array:
    """Channel concat (darknet [route] with multiple layers, src/route_layer.c)."""
    return jnp.concatenate(tensors, axis=-1)


def shortcut_add(x: jax.Array, skip: jax.Array) -> jax.Array:
    """Residual add (darknet [shortcut]); same-shape case (src/blas.c:490-514
    also handles mismatched shapes via strided indexing — YOLOv3 only uses the
    same-shape form, so that is what we support)."""
    return x + skip
