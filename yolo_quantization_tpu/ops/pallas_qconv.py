"""Pallas fused uint8 conv kernel: int8 MXU matmuls + requant epilogue in VMEM.

The hand-scheduled counterpart of ops/qconv.py (which lets XLA lower
lax.conv_general_dilated).  One kernel does, per (image, row-tile,
out-channel-tile) grid cell:

  - DMA of a row-window SLAB from the HBM-resident padded input into VMEM
    scratch (only on the first channel tile — the window is reused across
    channel tiles).  The input is viewed flat as (Hp*Wp, Ci), so each of the
    K*K taps is ONE contiguous row-slice of the slab at offset dy*Wp+dx —
    no per-tap vector reshape (Mosaic shape casts of packed int8 vectors are
    slow or unsupported).  The k-1 garbage columns per row ride through the
    GEMM (<2-8% extra rows) and are sliced off in XLA afterwards.
  - K*K int8 dot_generals accumulating into an int32 tile (implicit GEMM:
    the im2col of the reference src/im2col.c never materializes; each kernel
    tap is a shifted (rows, Cin) x (Cin, Co) MXU matmul over the slab)
  - fused epilogue while the tile is still in VMEM: int32 bias add,
    per-channel f32 requant multiply (M = S1*S2/S3), quantized
    leaky/relu/relu6/linear activation, output zero point, clamp, uint8 store
    (the reference's src/convolutional_layer.c:726-750 epilogue, which there
    is a separate full-tensor CPU pass)

Keeping the input in HBM and streaming windows bounds VMEM by the TILE, not
the image: large inputs (416 stem, 608 multi-scale) fit where a whole-image
VMEM block blows the ~16 MB scoped budget.

Scope: stride-1 convs with symmetric weights (the default TPU scheme, see
infer/convert.py) — every conv in yolov3-tiny.  Strided or asymmetric layers
fall back to the XLA path; infer/engine.py dispatches per layer.

Layout notes (pallas_guide.md): int8 tiles are (32, 128); row-tiles are chosen
so rows = TH*Wp lands near 4096 and the lane dim is the output-channel tile
(<=128 channels per grid step).  Mosaic memref-slice alignment requires Wp
8-aligned and Ci 128-aligned (both padded here; channel padding is zeros on
input AND weights so it contributes nothing — the MXU padded K internally
anyway).
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


def _row_tile(wp: int, h_out: int, even: bool = False) -> int:
    """Pick TH so the GEMM row dim TH*Wp lands near 4096 rows.

    Prefers a TH that divides h_out exactly (no masked tail work); partial
    tails are still handled correctly via bottom padding in the caller.
    ``even`` additionally requires TH % 2 == 0 (fused pooling).
    """
    if h_out * wp <= 4096 and not (even and h_out % 2):
        return h_out
    target = max(2 if even else 1, 4096 // wp)
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
    x_hbm,      # (N, Hp*Wp, Ci) int8, padded input, flat rows, HBM (ANY)
    w_ref,      # (K, K, Ci, TCO) int8
    bias_ref,   # (1, TCO) int32   (2-D: 1-D operands trip XLA/Mosaic layout
    m_ref,      # (1, TCO) float32  mismatches for multi-tile channel dims)
    out_ref,    # (1, TH*Wp, TCO) uint8 — or (1, TH/2*Wp/2, TCO) when pooled
    xwin,       # VMEM scratch ((TH+K-1)*Wp + 8, Ci) int8 — the DMA'd slab
    dma_sem,
    *,
    k: int,
    th: int,
    wp: int,
    act: int,
    out_zp: int,
    pool: bool = False,
    out_i8: bool = False,
):
    nn = pl.program_id(0)  # image index (ANY-space input is the whole array)
    i = pl.program_id(1)   # row-tile index
    j = pl.program_id(2)   # channel-tile index (fastest grid dim)
    tco = out_ref.shape[2]

    # fetch the input slab once per (image, row-tile); it is reused by every
    # channel tile (j is the innermost grid dim, scratch persists).  The +8
    # tail covers the last tap's dy*Wp+dx offset and keeps the DMA length
    # 8-aligned.
    @pl.when(j == 0)
    def _fetch():
        copy = pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(i * th * wp, (th + k - 1) * wp + 8)],
            xwin,
            dma_sem,
        )
        copy.start()
        copy.wait()

    rows = th * wp
    acc = jnp.zeros((rows, tco), jnp.int32)
    for dy in range(k):
        for dx in range(k):
            xs = xwin[pl.ds(dy * wp + dx, rows), :]  # one slice, no reshape
            acc = acc + lax.dot_general(
                xs,
                w_ref[dy, dx, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    out_rows = rows
    if pool:
        # fused 2x2/stride-2 maxpool, taken on the int32 accumulators BEFORE
        # the epilogue: the per-channel map acc -> code (bias add, requant
        # multiply with M>0, leaky/relu, zero point, clamp, round) is
        # monotonic nondecreasing, so max commutes with it and the result is
        # bit-identical to conv->requant->pool — while doing 1/4 the epilogue
        # work and never writing the conv output to HBM.  Non-overlapping
        # windows because darknet's size-2/stride-2 pool on even maps has
        # offset 0.  Garbage columns pool with garbage only (w_out and Wp are
        # both even).  (Pooling after the u8 cast trips Mosaic: 5-D shape
        # casts of packed int8 vectors are unsupported; in int32 they
        # compile.)
        acc = acc.reshape(th // 2, 2, wp // 2, 2, tco)
        acc = jnp.maximum(acc[:, 0], acc[:, 1])         # (th/2, wp/2, 2, tco)
        acc = jnp.maximum(acc[:, :, 0], acc[:, :, 1])   # (th/2, wp/2, tco)
        out_rows = (th // 2) * (wp // 2)
        acc = acc.reshape(out_rows, tco)
    vf = (acc + bias_ref[0, :].reshape(1, tco)).astype(jnp.float32) * m_ref[
        0, :
    ].reshape(1, tco)
    if act == ACT_LEAKY:
        # slope before the single rounding (qconv.requant_activate deviation 8)
        vf = jnp.where(vf < 0, vf * jnp.float32(0.1), vf)
    v = jnp.round(vf)
    # relu/relu6 fold into the clamp (exact; see qconv.requant_activate)
    relu_like = act in (ACT_RELU, ACT_RELU6)
    # Mosaic has no f32->u8/i8 cast; round-trip through int32 (clip keeps range)
    if out_i8:  # shifted-code representation (see qconv.requant_activate)
        lo = max(out_zp - 128, -128) if relu_like else -128
        v = jnp.clip(v + (out_zp - 128), float(lo), 127.0).astype(jnp.int32).astype(jnp.int8)
    else:
        lo = max(out_zp, 0) if relu_like else 0
        v = jnp.clip(v + out_zp, float(lo), 255.0).astype(jnp.int32).astype(jnp.uint8)
    # flat-rows store, no vector reshape; partial when the block was padded
    # to the 8-sublane boundary
    out_ref[0, :out_rows, :] = v


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "act", "out_zp_static", "fuse_pool",
                     "interpret", "out_i8"),
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
    out_i8: bool = False,
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

    # Mosaic memref-slice alignment for the slab DMA: Wp to 8 sublanes
    # (extra right columns become per-row garbage GEMM rows, sliced off at
    # the end), Ci to 128 lanes (zero-padded, contributes nothing)
    wp = w + 2 * pad + (-(w + 2 * pad) % 8)
    right = wp - w - pad
    ci_extra = -ci % 128

    th = _row_tile(wp, h_out, even=fuse_pool)
    tco = min(co, 128)
    num_row_tiles = pl.cdiv(h_out, th)
    grid = (n, num_row_tiles, pl.cdiv(co, tco))

    x_i8 = x_u8 if x_u8.dtype == jnp.int8 else u8_to_i8(x_u8)
    # Pad top/left/right by `pad` with the zero point; pad the BOTTOM far
    # enough that the last (partial) row tile's slab DMA never clamps — a
    # clamped start silently shifts every tap's rows and corrupts the whole
    # tail tile.  +1 row covers the slab's 8-element alignment tail.  Extra
    # rows only feed masked-out outputs.
    bottom = pad + (num_row_tiles * th - h_out) + 1
    x_i8 = jnp.pad(
        x_i8,
        ((0, 0), (pad, bottom), (pad, right), (0, 0)),
        constant_values=x_zp_i32.astype(jnp.int8),
    )
    if ci_extra:
        x_i8 = jnp.pad(x_i8, ((0, 0),) * 3 + ((0, ci_extra),))
        w_i8 = jnp.pad(w_i8, ((0, 0), (0, 0), (0, ci_extra), (0, 0)))
        ci += ci_extra
    hp = x_i8.shape[1]
    x_flat = x_i8.reshape(n, hp * wp, ci)

    kernel = functools.partial(
        _qconv_kernel, k=k, th=th, wp=wp, act=act, out_zp=out_zp_static,
        pool=fuse_pool, out_i8=out_i8,
    )
    # rows dim stays flat inside the kernel; the 4-D un-flatten below is an
    # XLA reshape (free relayout), not a Mosaic vector shape cast
    if fuse_pool:
        oh, ow, owp, orows = h_out // 2, w_out // 2, wp // 2, (th // 2) * (wp // 2)
    else:
        oh, ow, owp, orows = h_out, w_out, wp, th * wp
    # a multi-tile rows dim must be 8-sublane aligned per block (Pallas block
    # layout rule); pad each tile's rows and strip the padding in XLA after
    orows_p = orows if num_row_tiles == 1 else -(-orows // 8) * 8
    out_dtype = jnp.int8 if out_i8 else jnp.uint8
    out_shape = jax.ShapeDtypeStruct((n, num_row_tiles * orows_p, co), out_dtype)
    out_spec = pl.BlockSpec(
        (1, orows_p, tco), lambda nn, ii, jj: (nn, ii, jj),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # the padded input stays in HBM (whole array; ANY space requires
            # a trivial index map); the kernel DMAs slabs per grid cell
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k, k, ci, tco), lambda nn, ii, jj: (0, 0, 0, jj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, tco), lambda nn, ii, jj: (0, jj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tco), lambda nn, ii, jj: (0, jj), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(((th + k - 1) * wp + 8, ci), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_flat, w_i8, bias_i32.reshape(1, -1), m.reshape(1, -1))
    # strip per-tile alignment padding and the garbage columns, un-flatten
    if orows_p != orows:
        out = out.reshape(n, num_row_tiles, orows_p, co)[:, :, :orows]
        out = out.reshape(n, num_row_tiles * orows, co)
    out = out[:, : oh * owp, :].reshape(n, oh, owp, co)
    return out[:, :, :ow, :]


def _s2d_phase_kernel(
    x_hbm,      # (N, Hp*Wp, Ci4) int8: s2d input, zp-padded, flat rows, HBM
    w_ref,      # (K, K, Ci4, 4*O) int8: block kernel, slot (py*2+px)*O + o
    bias_ref,   # (1, O) int32
    m_ref,      # (1, O) float32
    out_ref,    # (1, TH*Wp, O) int8
    xwin,       # VMEM scratch ((TH+K-1)*Wp + 8, Ci4)
    dma_sem,
    *,
    k: int,
    th: int,
    wp: int,
    act: int,
    out_zp: int,
):
    """Space-to-depth conv + 4-phase max on the int32 accumulators + fused
    epilogue — the stem kernel VERDICT r2 item 1 asked for.

    The 2x2/s2 maxpool that follows a stem conv becomes, in s2d space, an
    elementwise max over the 4 output-phase channel groups; taking it on the
    accumulators BEFORE the epilogue is exact (the per-channel epilogue map
    is monotone nondecreasing and identical across a channel's 4 phases) and
    runs the VPU epilogue on 1/4 the elements while the 4x-channel conv
    output never exists outside VMEM — the fusion XLA cannot express
    (docs/perf.md round 3: a conv may not be duplicated into a multi-use
    consumer fusion, so the int32 accumulator materializes in HBM).
    """
    nn = pl.program_id(0)
    i = pl.program_id(1)
    o_out = out_ref.shape[2]

    copy = pltpu.make_async_copy(
        x_hbm.at[nn, pl.ds(i * th * wp, (th + k - 1) * wp + 8)],
        xwin,
        dma_sem,
    )
    copy.start()
    copy.wait()

    rows = th * wp
    acc = jnp.zeros((rows, 4 * o_out), jnp.int32)
    for dy in range(k):
        for dx in range(k):
            xs = xwin[pl.ds(dy * wp + dx, rows), :]
            acc = acc + lax.dot_general(
                xs,
                w_ref[dy, dx, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    am = jnp.maximum(
        jnp.maximum(acc[:, :o_out], acc[:, o_out : 2 * o_out]),
        jnp.maximum(acc[:, 2 * o_out : 3 * o_out], acc[:, 3 * o_out :]),
    )
    vf = (am + bias_ref[0, :].reshape(1, o_out)).astype(jnp.float32) * m_ref[
        0, :
    ].reshape(1, o_out)
    if act == ACT_LEAKY:
        vf = jnp.where(vf < 0, vf * jnp.float32(0.1), vf)
    v = jnp.round(vf)
    relu_like = act in (ACT_RELU, ACT_RELU6)
    lo = max(out_zp - 128, -128) if relu_like else -128
    v = jnp.clip(v + (out_zp - 128), float(lo), 127.0).astype(jnp.int32).astype(jnp.int8)
    out_ref[0, :rows, :] = v


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_zp_static", "interpret"),
)
def pallas_s2d_conv_phase_max(
    xs_i8: jax.Array,
    w_s2d: jax.Array,
    bias_i32: jax.Array,
    m: jax.Array,
    x_zp_i32: jax.Array,
    *,
    act: int = ACT_LINEAR,
    out_zp_static: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused s2d stem stage: 3x3/s1/p1 block conv on the space-to-depth input
    (convert._s2d_weights layout) + 4-phase max on int32 accumulators +
    requant epilogue.  Bit-identical to the engine's XLA s2d acc-max path
    (conv_acc_int32 -> slice max -> requant_activate); covers conv+following
    2x2/s2 maxpool of the original graph.

    xs_i8: (N, H2, W2, 4C) shifted int8 codes; returns (N, H2, W2, O) int8.
    """
    n, h2, w2, ci4 = xs_i8.shape
    k = w_s2d.shape[0]
    o_out = w_s2d.shape[3] // 4
    pad = 1
    wp = w2 + 2 * pad + (-(w2 + 2 * pad) % 8)
    right = wp - w2 - pad
    ci_extra = -ci4 % 128

    th = _row_tile(wp, h2)
    num_row_tiles = pl.cdiv(h2, th)
    grid = (n, num_row_tiles)

    bottom = pad + (num_row_tiles * th - h2) + 1
    x = jnp.pad(
        xs_i8,
        ((0, 0), (pad, bottom), (pad, right), (0, 0)),
        constant_values=x_zp_i32.astype(jnp.int8),
    )
    w = w_s2d
    if ci_extra:
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, ci_extra),))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, ci_extra), (0, 0)))
    hp = x.shape[1]
    x_flat = x.reshape(n, hp * wp, ci4 + ci_extra)

    kernel = functools.partial(
        _s2d_phase_kernel, k=k, th=th, wp=wp, act=act, out_zp=out_zp_static,
    )
    orows = th * wp
    orows_p = orows if num_row_tiles == 1 else -(-orows // 8) * 8
    out_shape = jax.ShapeDtypeStruct((n, num_row_tiles * orows_p, o_out), jnp.int8)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k, k, ci4 + ci_extra, 4 * o_out), lambda nn, ii: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, o_out), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_out), lambda nn, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, orows_p, o_out), lambda nn, ii: (nn, ii, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(((th + k - 1) * wp + 8, ci4 + ci_extra), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_flat, w, bias_i32.reshape(1, -1), m.reshape(1, -1))
    if orows_p != orows:
        out = out.reshape(n, num_row_tiles, orows_p, o_out)[:, :, :orows]
        out = out.reshape(n, num_row_tiles * orows, o_out)
    out = out[:, : h2 * wp, :].reshape(n, h2, wp, o_out)
    return out[:, :, :w2, :]
