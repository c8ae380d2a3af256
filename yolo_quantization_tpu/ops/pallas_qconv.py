"""Pallas fused uint8 conv kernel: int8 MXU matmuls + requant epilogue in VMEM.

The hand-scheduled counterpart of ops/qconv.py (which lets XLA lower
lax.conv_general_dilated).  One kernel does, per (image, row-tile,
out-channel-tile) grid cell:

  - K*K int8 dot_generals accumulating into an int32 tile (implicit GEMM:
    the im2col of the reference src/im2col.c never materializes; each kernel
    tap is a shifted (rows, Cin) x (Cin, Co) MXU matmul over the VMEM-resident
    padded input)
  - fused epilogue while the tile is still in VMEM: int32 bias add,
    per-channel f32 requant multiply (M = S1*S2/S3), quantized
    leaky/relu/relu6/linear activation, output zero point, clamp, uint8 store
    (the reference's src/convolutional_layer.c:726-750 epilogue, which there
    is a separate full-tensor CPU pass)

Scope: stride-1 convs with symmetric weights (the default TPU scheme, see
infer/convert.py) — every conv in yolov3-tiny.  Strided or asymmetric layers
fall back to the XLA path; infer/engine.py dispatches per layer.

Layout notes (pallas_guide.md): int8 tiles are (32, 128); row-tiles are chosen
so rows = TH*W_out is a multiple of 32 where possible and the lane dim is the
output-channel tile (<=128 channels per grid step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolo_quantization_tpu.ops.qconv import (
    ACT_LEAKY,
    ACT_LINEAR,
    ACT_RELU,
    ACT_RELU6,
    u8_to_i8,
)


def _row_tile(w_out: int, h_out: int, even: bool = False) -> int:
    """Pick TH so the GEMM row dim TH*w_out lands near 4096 rows.

    Prefers a TH that divides h_out exactly (no masked tail work); partial
    tails are still handled correctly via bottom padding in the caller.
    ``even`` additionally requires TH % 2 == 0 (fused pooling).
    """
    if h_out * w_out <= 4096 and not (even and h_out % 2):
        return h_out
    target = max(2 if even else 1, 4096 // w_out)
    best = None
    for th in range(target, 0, -1):
        if even and th % 2:
            continue
        if h_out % th == 0:
            best = th
            break
    if best is None:
        best = min(max(2 if even else 1, target), h_out + (h_out % 2 if even else 0))
        if even and best % 2:
            best += 1
    return best


def _qconv_kernel(
    x_ref,      # (1, Hp, Wp, Ci) int8, whole padded image (VMEM)
    w_ref,      # (K, K, Ci, TCO) int8
    bias_ref,   # (1, TCO) int32   (2-D: 1-D operands trip XLA/Mosaic layout
    m_ref,      # (1, TCO) float32  mismatches for multi-tile channel dims)
    out_ref,    # (1, TH*Wo, TCO) uint8 — or (1, TH/2*Wo/2, TCO) when pooled
                # (rows stay flat: Mosaic cannot shape-cast packed int8
                # vectors to split the sublane dim when TCO < 128 lanes; the
                # caller un-flattens in XLA where the reshape is free)
    *,
    k: int,
    th: int,
    w_out: int,
    act: int,
    out_zp: int,
    pool: bool = False,
):
    i = pl.program_id(1)  # row-tile index
    ci = x_ref.shape[3]
    tco = out_ref.shape[2]
    acc = jnp.zeros((th * w_out, tco), jnp.int32)
    for dy in range(k):
        for dx in range(k):
            xs = x_ref[0, pl.ds(i * th + dy, th), pl.ds(dx, w_out), :]
            xs = xs.reshape(th * w_out, ci)
            wv = w_ref[dy, dx, :, :]
            acc = acc + lax.dot_general(
                xs,
                wv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    rows_h, rows_w = th, w_out
    orows = out_ref.shape[1]  # block rows, >= rows_h*rows_w (8-aligned)
    if pool:
        # fused 2x2/stride-2 maxpool, taken on the int32 accumulators BEFORE
        # the epilogue: the per-channel map acc -> code (bias add, requant
        # multiply with M>0, leaky/relu, zero point, clamp, round) is
        # monotonic nondecreasing, so max commutes with it and the result is
        # bit-identical to conv->requant->pool — while doing 1/4 the epilogue
        # work and never writing the conv output to HBM.  Non-overlapping
        # windows because darknet's size-2/stride-2 pool on even maps has
        # offset 0.  (Pooling after the u8 cast trips Mosaic: 5-D shape casts
        # of packed int8 vectors are unsupported; in int32 they compile.)
        acc = acc.reshape(th // 2, 2, w_out // 2, 2, tco)
        acc = jnp.maximum(acc[:, 0], acc[:, 1])         # (th/2, w/2, 2, tco)
        acc = jnp.maximum(acc[:, :, 0], acc[:, :, 1])   # (th/2, w/2, tco)
        rows_h, rows_w = th // 2, w_out // 2
        acc = acc.reshape(rows_h * rows_w, tco)
    v = jnp.round(
        (acc + bias_ref[0, :].reshape(1, tco)).astype(jnp.float32)
        * m_ref[0, :].reshape(1, tco)
    )
    if act == ACT_LEAKY:
        v = jnp.where(v < 0, jnp.round(v * 0.1), v)
    elif act in (ACT_RELU, ACT_RELU6):
        v = jnp.maximum(v, 0.0)
    # Mosaic has no f32->u8 cast; round-trip through int32 (clip keeps range)
    v = jnp.clip(v + out_zp, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    # flat-rows store, no vector reshape; partial when the block was padded
    # to the 8-sublane boundary
    out_ref[0, : rows_h * rows_w, :] = v


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "act", "out_zp_static", "fuse_pool",
                     "interpret"),
)
def pallas_quantized_conv2d(
    x_u8: jax.Array,
    w_i8: jax.Array,
    bias_i32: jax.Array,
    m: jax.Array,
    x_zp_i32: jax.Array,
    *,
    stride: int = 1,
    pad: int = 0,
    act: int = ACT_LINEAR,
    out_zp_static: int = 0,
    fuse_pool: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused uint8 conv (symmetric weights, stride 1).  Same math as
    ops.qconv.quantized_conv2d(symmetric=True) — bit-identical up to the f32
    rounding already shared by both paths.

    ``fuse_pool`` additionally applies the following darknet size-2/stride-2
    maxpool inside the kernel epilogue (valid for even conv output dims; max
    on uint8 codes is scale-invariant so the fused result is bit-identical to
    conv-then-pool), halving the HBM traffic of the conv's output.
    """
    if stride != 1:
        raise NotImplementedError("pallas path covers stride-1; use XLA fallback")
    n, h, w, ci = x_u8.shape
    k, _, _, co = w_i8.shape
    h_out = h + 2 * pad - k + 1
    w_out = w + 2 * pad - k + 1
    if fuse_pool and (h_out % 2 or w_out % 2):
        raise ValueError("fuse_pool requires even conv output dims")

    th = _row_tile(w_out, h_out, even=fuse_pool)
    tco = min(co, 128)
    num_row_tiles = pl.cdiv(h_out, th)
    grid = (n, num_row_tiles, pl.cdiv(co, tco))

    x_i8 = u8_to_i8(x_u8)
    # Pad top/left/right by `pad` with the zero point; pad the BOTTOM far
    # enough that the last (partial) row tile's in-kernel dynamic slices never
    # clamp — a clamped pl.ds start silently shifts every tap's rows and
    # corrupts the whole tail tile.  Extra rows only feed masked-out outputs.
    bottom = pad + (num_row_tiles * th - h_out)
    if pad or bottom:
        x_i8 = jnp.pad(
            x_i8,
            ((0, 0), (pad, bottom), (pad, pad), (0, 0)),
            constant_values=x_zp_i32.astype(jnp.int8),
        )

    kernel = functools.partial(
        _qconv_kernel, k=k, th=th, w_out=w_out, act=act, out_zp=out_zp_static,
        pool=fuse_pool,
    )
    # rows dim stays flat inside the kernel; the 4-D un-flatten below is an
    # XLA reshape (free relayout), not a Mosaic vector shape cast
    if fuse_pool:
        oh, ow, orows = h_out // 2, w_out // 2, (th // 2) * (w_out // 2)
    else:
        oh, ow, orows = h_out, w_out, th * w_out
    # a multi-tile rows dim must be 8-sublane aligned per block (Pallas block
    # layout rule); pad each tile's rows and strip the padding in XLA after
    orows_p = orows if num_row_tiles == 1 else -(-orows // 8) * 8
    out_shape = jax.ShapeDtypeStruct((n, num_row_tiles * orows_p, co), jnp.uint8)
    out_spec = pl.BlockSpec(
        (1, orows_p, tco), lambda nn, ii, jj: (nn, ii, jj),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, x_i8.shape[1], x_i8.shape[2], ci),
                lambda nn, ii, jj: (nn, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, k, ci, tco), lambda nn, ii, jj: (0, 0, 0, jj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tco), lambda nn, ii, jj: (0, jj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tco), lambda nn, ii, jj: (0, jj), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x_i8, w_i8, bias_i32.reshape(1, -1), m.reshape(1, -1))
    # strip per-tile alignment padding and bottom-padding rows, un-flatten
    if orows_p != orows:
        out = out.reshape(n, num_row_tiles, orows_p, co)[:, :, :orows]
        out = out.reshape(n, num_row_tiles * orows, co)
    return out[:, : oh * ow, :].reshape(n, oh, ow, co)
