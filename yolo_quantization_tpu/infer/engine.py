"""Integer inference engine: compiles an IntProgram into one jitted TPU function.

The TPU analog of the reference's forward_network integer loop
(src/network.c:229-338 + src/convolutional_layer.c:694-761): a single XLA
program that takes a float NHWC image batch, quantizes it on-device, runs
every layer in the uint8/int32 domain (int8 convs on the MXU, requant
epilogues on the VPU, uint8 maxpool/route/upsample), dequantizes at the
quant_stop heads, and decodes the YOLO outputs — one compilation, zero
host-device ping-pong per layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yolo_quantization_tpu.eval import detect
from yolo_quantization_tpu.infer.convert import IntProgram
from yolo_quantization_tpu.nn import layers as L
from yolo_quantization_tpu.nn.graph import (
    DetectionSpec,
    RegionSpec,
    YoloSpec,
    apply_simple_layer,
)
from yolo_quantization_tpu.ops import qconv


def _quantize_input(x: jax.Array, scale: float, zp: int) -> jax.Array:
    """Image floats -> uint8 codes (reference src/blas.c:213-256 quantizes the
    letterboxed input with the stored input scale per image)."""
    q = jnp.round(x / scale) + zp
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def _requant_u8(x_u8: jax.Array, ratio: float, zp_in: int, zp_out: int) -> jax.Array:
    """Affine regrid of uint8 codes: out = round((q - zi) * ratio) + zo."""
    v = jnp.round((x_u8.astype(jnp.float32) - zp_in) * ratio) + zp_out
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def build_forward(program: IntProgram, use_pallas: bool = False,
                  pallas_interpret: bool = False, return_outputs: bool = False):
    """Return a pure fn(arrays, x_f32_nhwc) -> (head_floats, feature_u8s).

    ``return_outputs=True`` makes the fn return (heads, per_layer_outputs) —
    every layer's tensor in order — for debugging and the cross-binary parity
    harness (scripts/parity_c.py).

    The layer loop is unrolled at trace time (specs are static); XLA fuses
    each conv with its epilogue and the surrounding u8 plumbing.

    ``use_pallas`` routes eligible convs (stride 1, symmetric weights) through
    the hand-fused Pallas kernel (ops/pallas_qconv.py); other layers keep the
    XLA path.  Toggle per deployment after benchmarking — the two are
    bit-identical (tests/test_pallas_qconv.py).
    """
    from yolo_quantization_tpu.nn.graph import MaxPoolSpec, RouteSpec, ShortcutSpec
    from yolo_quantization_tpu.ops.pallas_qconv import pallas_quantized_conv2d

    net = program.net
    cfg = program.cfg

    def _referenced_elsewhere(i: int) -> bool:
        """Is layer i's output consumed by anything besides layer i+1?"""
        for spec in net.specs:
            if isinstance(spec, RouteSpec) and i in spec.layers:
                return True
            if isinstance(spec, ShortcutSpec) and spec.index == i:
                return True
        return False

    shapes = net.shapes()

    def _pallas_eligible(i: int, c) -> bool:
        """Static per-layer check for the Pallas kernel.

        Beyond stride-1/symmetric: the kernel zero-pads the channel dim to
        128 lanes (DMA alignment), so tiny-channel layers — the 3-channel
        stem conv especially — would move 8-42x their real bytes; they are
        also the layers XLA's native conv handles best, so they stay on the
        XLA path.  Spatial size is unconstrained: the kernel streams row
        slabs from HBM, VMEM use is bounded by the tile, not the image.
        """
        if c.kind != "qconv" or not c.symmetric_w or c.spec.stride != 1:
            return False
        _, _, ic = shapes[i - 1] if i > 0 else (net.height, net.width, net.channels)
        return ic >= 16

    # conv+maxpool fusion plan: a Pallas-eligible conv whose only consumer is
    # the immediately following size-2/stride-2 maxpool runs as one kernel
    # (bit-identical; halves the conv output's HBM traffic).  Requires even
    # conv output dims (whole pool windows) — odd maps fall back to unfused.
    fused_into_next: set[int] = set()
    if use_pallas:
        for i, c in enumerate(cfg[:-1]):
            nxt = cfg[i + 1].spec
            oh, ow, _ = shapes[i]
            if (
                _pallas_eligible(i, c)
                and not c.quant_stop
                and oh % 2 == 0
                and ow % 2 == 0
                and isinstance(nxt, MaxPoolSpec)
                and nxt.size == 2
                and nxt.stride == 2
                and nxt.padding == 1
                and not _referenced_elsewhere(i)
            ):
                fused_into_next.add(i)

    def forward(arrays, x):
        x = _quantize_input(x, program.in_scale, program.in_zp)
        outputs = []
        heads = []
        skip_next = False
        for i, c in enumerate(cfg):
            s = c.spec
            if skip_next:
                # this maxpool was fused into the previous conv kernel
                skip_next = False
                outputs.append(outputs[-1])
                continue
            if i in fused_into_next:
                a = arrays[i]
                if x.dtype != jnp.uint8:
                    qp = c.in_scales[0]
                    x = _quantize_input(x, qp[0], qp[1])
                y = pallas_quantized_conv2d(
                    x, a["w_i8"], a["bias_i32"], a["m"], a["x_zp"],
                    stride=1, pad=s.pad, act=c.act,
                    out_zp_static=int(c.out_zp), fuse_pool=True,
                    interpret=pallas_interpret,
                )
                # outputs[i] is the (unavailable) pre-pool tensor; the fusion
                # plan guarantees nothing references it
                outputs.append(y)
                x = y
                skip_next = True
                continue
            if c.kind == "qconv":
                a = arrays[i]
                if x.dtype != jnp.uint8:
                    # float -> quant boundary (mixed graphs): quantize the
                    # input with the QAT-tracked boundary range
                    qp = c.in_scales[0]
                    x = _quantize_input(x, qp[0], qp[1])
                if use_pallas and _pallas_eligible(i, c):
                    y = pallas_quantized_conv2d(
                        x, a["w_i8"], a["bias_i32"], a["m"], a["x_zp"],
                        stride=1, pad=s.pad, act=c.act,
                        out_zp_static=int(c.out_zp),
                        interpret=pallas_interpret,
                    )
                else:
                    y = qconv.quantized_conv2d(
                        x, a["w_i8"], a["bias_i32"], a["m"], a["x_zp"], a["w_zp"],
                        a["out_zp"], stride=s.stride, pad=s.pad, act=c.act,
                        symmetric=c.symmetric_w,
                    )
                if c.quant_stop:
                    y = (y.astype(jnp.float32) - c.out_zp) * c.out_scale
            elif c.kind == "fconv":
                # float conv (per-layer quantized=0, reference float path)
                a = arrays[i]
                if x.dtype == jnp.uint8:
                    qp = c.in_scales[0]
                    x = (x.astype(jnp.float32) - qp[1]) * qp[0]
                y = L.conv2d(x, a["w_f32"], s.stride, s.pad)
                y = L.activate(y + a["bias_f32"].reshape(1, 1, 1, -1), s.activation)
            elif c.kind == "maxpool":
                if x.dtype == jnp.uint8:
                    y = L.maxpool_u8(x, s.size, s.stride, s.padding)
                else:
                    y = L.maxpool(x, s.size, s.stride, s.padding)
            elif c.kind == "upsample":
                y = L.upsample_nearest(x, s.stride)
            elif c.kind == "route":
                parts = []
                for (j, (identity, ratio, zp_in)) in zip(s.layers, c.branches):
                    t = outputs[j]
                    if not identity:
                        t = _requant_u8(t, ratio, zp_in, c.out_zp)
                    parts.append(t)
                y = jnp.concatenate(parts, axis=-1)
            elif c.kind == "route_f32":
                parts = []
                for (j, qp) in zip(s.layers, c.branches):
                    t = outputs[j]
                    if t.dtype == jnp.uint8:
                        t = (t.astype(jnp.float32) - qp[1]) * qp[0]
                    parts.append(t)
                y = jnp.concatenate(parts, axis=-1)
            elif c.kind in ("shortcut", "shortcut_f32"):
                qp_x, qp_k = c.in_scales
                fx = (
                    (x.astype(jnp.float32) - qp_x[1]) * qp_x[0]
                    if x.dtype == jnp.uint8 else x
                )
                skip = outputs[s.index]
                fk = (
                    (skip.astype(jnp.float32) - qp_k[1]) * qp_k[0]
                    if skip.dtype == jnp.uint8 else skip
                )
                f = L.activate(fx + fk, s.activation)
                y = _quantize_input(f, c.out_scale, c.out_zp) if c.kind == "shortcut" else f
            elif c.kind == "yolo":
                if x.dtype == jnp.uint8:
                    # quantized pre-head conv without quant_stop: the decoder
                    # needs reals, so dequantize with the producer's params
                    x = (x.astype(jnp.float32) - c.out_zp) * c.out_scale
                y = x
                heads.append(x)
            elif c.kind == "simple":
                if x.dtype == jnp.uint8:
                    qp = c.in_scales[0]
                    x = (x.astype(jnp.float32) - qp[1]) * qp[0]
                y = apply_simple_layer(s, arrays.get(i), x, train=False)
                if isinstance(s, (RegionSpec, DetectionSpec)):
                    heads.append(y)
            else:
                raise ValueError(c.kind)
            outputs.append(y)
            x = y
        if return_outputs:
            return heads, outputs
        return heads

    return forward


class Engine:
    """Batched quantized-inference engine for one model + converted program.

    predict() runs image batch -> decoded (boxes, objectness, class_probs)
    entirely on device, then hands the top-k to the host — the equivalent of
    the reference's network_predict + get_network_boxes
    (src/network.c:570-640) without per-layer host transfers.
    """

    def __init__(self, program: IntProgram, max_det: int = 256,
                 use_pallas: bool = False):
        self.program = program
        self.max_det = max_det
        self.use_pallas = use_pallas
        self.arrays = jax.device_put(program.arrays)
        fwd = build_forward(program, use_pallas=use_pallas)
        net = program.net

        @jax.jit
        def _run(arrays, x):
            heads = fwd(arrays, x)
            boxes, obj, cls = detect.decode_all_heads(heads, net)
            return detect.top_k_detections(boxes, obj, cls, self.max_det)

        self._run = _run
        self._raw_heads = jax.jit(fwd)

        from yolo_quantization_tpu.nn.graph import HEAD_SPECS, YoloSpec

        head_specs = [s for s in net.specs if isinstance(s, HEAD_SPECS)]

        @jax.jit
        def _run_flip(arrays, x):
            # flip TTA (`detector valid2`, examples/detector.c:260-388): run
            # the image and its mirror in one doubled batch, average the raw
            # yolo heads (avg_flipped_yolo), decode once.  Non-yolo heads
            # keep the unflipped prediction (the reference's flip path only
            # averages yolo layers).
            n = x.shape[0]
            heads = fwd(arrays, jnp.concatenate([x, x[:, :, ::-1, :]], axis=0))
            merged = []
            for h_raw, spec in zip(heads, head_specs):
                if isinstance(spec, YoloSpec):
                    merged.append(
                        detect.flip_average_head(h_raw[:n], h_raw[n:], spec.classes)
                    )
                else:
                    merged.append(h_raw[:n])
            boxes, obj, cls = detect.decode_all_heads(merged, net)
            return detect.top_k_detections(boxes, obj, cls, self.max_det)

        self._run_flip = _run_flip

    def predict(self, images: np.ndarray, flip: bool = False):
        """images: (N, H, W, 3) float32 letterboxed to the network size.

        ``flip`` enables horizontal-flip test-time averaging (the reference's
        `detector valid2` mode).
        """
        net = self.program.net
        if images.shape[1:] != (net.height, net.width, net.channels):
            raise ValueError(
                f"engine expects {(net.height, net.width, net.channels)} images, "
                f"got {images.shape[1:]}; letterbox to the network size first"
            )
        run = self._run_flip if flip else self._run
        boxes, obj, cls = run(self.arrays, jnp.asarray(images))
        return np.asarray(boxes), np.asarray(obj), np.asarray(cls)

    def raw_heads(self, images: np.ndarray):
        heads = self._raw_heads(self.arrays, jnp.asarray(images))
        return [np.asarray(h) for h in heads]
