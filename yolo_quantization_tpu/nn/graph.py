"""Declarative network graph: layer specs, parameter init, float/QAT forward.

Replaces the reference's cfg-file parser + mutable layer structs + sequential
executor (src/parser.c:682-815, src/network.c:229-338) with an immutable spec
list and a pure functional forward.  A model is a tuple of *Spec dataclasses;
parameters and quantization state are pytrees keyed by layer index, so the
whole forward jits and shards with pjit without any graph-side mutation.

Forward modes:
  - float inference  (BN rolling stats)               — parity with reference
    float path (src/convolutional_layer.c:802-848)
  - float training   (BN batch stats, stats returned for rolling update)
  - QAT              (BN folded into weights with batch-stat correction,
    per-channel weight fake-quant, EMA-tracked activation fake-quant) —
    the reference's GPU QAT graph (src/convolutional_kernels.cu:107-216)
    without its per-step host round-trips.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from yolo_quantization_tpu.core.quant import (
    ema_update,
    fake_quant,
    fake_quant_per_channel,
    fake_quant_symmetric_per_channel,
)
from yolo_quantization_tpu.nn import layers as L


# ---------------------------------------------------------------------------
# Layer specs (succeed the darknet cfg sections, reference src/parser.c:710-787)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ConvSpec:
    filters: int
    size: int = 3
    stride: int = 1
    pad: int = 1
    activation: str = "leaky"
    batch_normalize: bool = True
    quantized: bool = True
    quant_stop: bool = False  # dequantize output to float (YOLO head input)


@dataclass(frozen=True)
class MaxPoolSpec:
    size: int = 2
    stride: int = 2
    pad: int | None = None  # darknet default: size - 1 (src/parser.c parse_maxpool)
    quantized: bool = True

    @property
    def padding(self) -> int:
        return self.size - 1 if self.pad is None else self.pad


@dataclass(frozen=True)
class RouteSpec:
    layers: tuple[int, ...]  # absolute layer indices (cfg importer normalizes)
    quantized: bool = True


@dataclass(frozen=True)
class UpsampleSpec:
    stride: int = 2
    quantized: bool = True


@dataclass(frozen=True)
class ShortcutSpec:
    index: int  # absolute layer index of the skip source
    activation: str = "linear"


@dataclass(frozen=True)
class YoloSpec:
    mask: tuple[int, ...]
    anchors: tuple[tuple[float, float], ...]  # ALL anchors; mask selects
    classes: int


LayerSpec = Any  # union of the above


@dataclass(frozen=True)
class NetworkDef:
    """A model: input geometry + ordered layer specs (the cfg [net] + sections)."""

    specs: tuple[LayerSpec, ...]
    width: int = 416
    height: int = 416
    channels: int = 3

    def out_channels(self) -> list[int]:
        """Static shape inference: #channels produced by each layer."""
        chans: list[int] = []
        c = self.channels
        for s in self.specs:
            if isinstance(s, ConvSpec):
                c = s.filters
            elif isinstance(s, RouteSpec):
                c = sum(chans[j] for j in s.layers)
            elif isinstance(s, (MaxPoolSpec, UpsampleSpec, ShortcutSpec, YoloSpec)):
                pass  # channel-preserving (yolo passes through)
            else:
                raise TypeError(f"unknown spec {s}")
            chans.append(c)
        return chans

    def head_indices(self) -> list[int]:
        return [i for i, s in enumerate(self.specs) if isinstance(s, YoloSpec)]

    def output_domains(self) -> list[str]:
        """Static per-layer output domain at integer inference: "u8" or "f32".

        Drives mixed float/quant graphs (the reference's per-layer
        ``quantized=`` flags, src/parser.c:193-194): quantized convs emit u8
        (f32 when quant_stop dequantizes), float convs emit f32,
        maxpool/upsample inherit, a route is u8 only if every branch is,
        a shortcut is u8 only if both inputs are.
        """
        doms: list[str] = []

        def inp(i: int) -> str:
            return doms[i - 1] if i > 0 else "u8"  # net input is quantized

        for i, s in enumerate(self.specs):
            if isinstance(s, ConvSpec):
                d = ("f32" if s.quant_stop else "u8") if s.quantized else "f32"
            elif isinstance(s, (MaxPoolSpec, UpsampleSpec)):
                d = inp(i)
            elif isinstance(s, RouteSpec):
                d = "u8" if s.quantized and all(doms[j] == "u8" for j in s.layers) else "f32"
            elif isinstance(s, ShortcutSpec):
                d = "u8" if inp(i) == "u8" and doms[s.index] == "u8" else "f32"
            elif isinstance(s, YoloSpec):
                d = inp(i)
            else:
                raise TypeError(f"unknown spec {s}")
            doms.append(d)
        return doms


# ---------------------------------------------------------------------------
# Parameter / state initialization
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, net: NetworkDef) -> dict[int, dict[str, jax.Array]]:
    """He-style init matching darknet's scale*randn (src/convolutional_layer.c:214-257).

    Conv params (HWIO): w, bias; with BN additionally gamma (darknet 'scales'),
    mean/var rolling stats (darknet rolling_mean/rolling_variance).  With BN
    the 'bias' slot is the BN beta, exactly like darknet reuses l.biases.
    """
    params: dict[int, dict[str, jax.Array]] = {}
    in_c = net.channels
    chans = net.out_channels()
    for i, s in enumerate(net.specs):
        if isinstance(s, ConvSpec):
            key, sub = jax.random.split(key)
            scale = jnp.sqrt(2.0 / (s.size * s.size * in_c))
            p = {
                "w": jax.random.normal(
                    sub, (s.size, s.size, in_c, s.filters), jnp.float32
                )
                * scale,
                "bias": jnp.zeros((s.filters,), jnp.float32),
            }
            if s.batch_normalize:
                p["gamma"] = jnp.ones((s.filters,), jnp.float32)
                p["mean"] = jnp.zeros((s.filters,), jnp.float32)
                p["var"] = jnp.ones((s.filters,), jnp.float32)
            params[i] = p
        in_c = chans[i]
    return params


def init_params_numpy(seed: int, net: NetworkDef) -> dict[int, dict[str, Any]]:
    """Host-side numpy twin of init_params — no device round-trips.

    Used by presets/bench where params are immediately consumed by the
    (numpy) converter; avoids shipping every random tensor through the
    accelerator just to pull it back.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    params: dict[int, dict[str, Any]] = {}
    in_c = net.channels
    chans = net.out_channels()
    for i, s in enumerate(net.specs):
        if isinstance(s, ConvSpec):
            scale = float(np.sqrt(2.0 / (s.size * s.size * in_c)))
            p = {
                "w": (rng.standard_normal((s.size, s.size, in_c, s.filters)) * scale).astype("float32"),
                "bias": np.zeros((s.filters,), "float32"),
            }
            if s.batch_normalize:
                p["gamma"] = np.ones((s.filters,), "float32")
                p["mean"] = np.zeros((s.filters,), "float32")
                p["var"] = np.ones((s.filters,), "float32")
            params[i] = p
        in_c = chans[i]
    return params


def init_quant_state(net: NetworkDef) -> dict[str, dict[str, jax.Array]]:
    """EMA range state for QAT: one (min, max) pair per tracked activation.

    Tracked: the network input ("input"), every quantized conv output, and
    every multi-input quantized route output.  Maxpool/upsample outputs stay on
    their input's grid (max / nearest-repeat are value-preserving), so unlike
    the reference (which fake-quants them too and then ignores the result at
    integer inference, src/maxpool_layer_kernels.cu:98-108) we do not track
    ranges for them — their scale is inherited, which the integer engine makes
    exact.  Zeros mean "unseen"; ema_update adopts the first batch stats.
    """
    import numpy as np

    qs: dict[str, dict[str, jax.Array]] = {
        "input": {"min": np.float32(0.0), "max": np.float32(0.0)}
    }
    domains = net.output_domains()
    for i, s in enumerate(net.specs):
        if isinstance(s, ConvSpec) and s.quantized:
            qs[f"act_{i}"] = {"min": np.float32(0.0), "max": np.float32(0.0)}
            if i > 0 and domains[i - 1] == "f32":
                # float -> quant boundary (mixed graphs): the conv input needs
                # its own tracked range to quantize by at inference
                qs[f"in_{i}"] = {"min": np.float32(0.0), "max": np.float32(0.0)}
        elif isinstance(s, RouteSpec) and s.quantized and len(s.layers) > 1:
            qs[f"act_{i}"] = {"min": np.float32(0.0), "max": np.float32(0.0)}
        elif isinstance(s, ShortcutSpec):
            # The reference leaves shortcut float-only (src/shortcut_layer.c) and
            # therefore cannot run full yolov3 end-to-end quantized; we track a
            # range so the engine can re-quantize after the float-domain add.
            qs[f"act_{i}"] = {"min": np.float32(0.0), "max": np.float32(0.0)}
    return qs


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ForwardMode:
    train: bool = False        # BN batch stats (+ stats aux out)
    qat: bool = False          # fake-quant weights + activations
    update_ranges: bool = False  # EMA-update quant ranges (training only)
    symmetric_w: bool = True   # weight fake-quant scheme; must match the
                               # convert(symmetric_weights=...) used at export


def _conv_forward(
    s: ConvSpec,
    p: dict[str, jax.Array],
    x: jax.Array,
    mode: ForwardMode,
    act_state: dict[str, jax.Array] | None,
):
    """One conv layer in any mode.  Returns (y, bn_stats|None, new_act_state|None).

    QAT path mirrors the reference training graph
    (src/convolutional_kernels.cu:107-216): compute batch statistics from a
    float conv, fold BN into the weights with those statistics, fake-quant the
    folded weights per output channel, run the real conv, add the folded bias,
    activate, and fake-quant the activation with EMA-tracked ranges.  Here the
    stats conv and the main conv share one XLA-fused graph instead of two
    cublas GEMMs with host round-trips.
    """
    bn_stats = None
    if s.batch_normalize:
        if mode.train:
            pre = L.conv2d(x, p["w"], s.stride, s.pad)
            mean, var = L.batch_stats(pre)
            bn_stats = (mean, var)
        else:
            mean, var = p["mean"], p["var"]
        w_folded, bias = L.fold_bn_into_weights(
            p["w"], None, p["gamma"], p["bias"], mean, var
        )
    else:
        w_folded, bias = p["w"], p["bias"]

    if mode.qat and s.quantized:
        if mode.symmetric_w:
            w_used = fake_quant_symmetric_per_channel(w_folded)
        else:
            w_min = jnp.min(w_folded, axis=(0, 1, 2))
            w_max = jnp.max(w_folded, axis=(0, 1, 2))
            w_used = fake_quant_per_channel(w_folded, w_min, w_max)
    else:
        w_used = w_folded

    y = L.conv2d(x, w_used, s.stride, s.pad) + bias.reshape(1, 1, 1, -1)
    y = L.activate(y, s.activation)

    new_state = act_state
    if mode.qat and s.quantized and act_state is not None:
        lo, hi = act_state["min"], act_state["max"]
        if mode.update_ranges:
            lo, hi = ema_update(lo, hi, jnp.min(y), jnp.max(y))
            new_state = {"min": lo, "max": hi}
        y = fake_quant(y, lo, hi)
    return y, bn_stats, new_state


def forward(
    net: NetworkDef,
    params: dict[int, dict[str, jax.Array]],
    x: jax.Array,
    mode: ForwardMode = ForwardMode(),
    quant_state: dict[str, dict[str, jax.Array]] | None = None,
):
    """Run the graph.  Returns (head_outputs, aux).

    head_outputs: list of raw float NHWC tensors, one per YoloSpec, channels
    laid out darknet-style as A*(4+1+classes) with per-anchor blocks.
    aux: {"bn_stats": {i: (mean, var)}, "quant_state": updated EMA ranges}.

    Replaces the reference's forward_network loop (src/network.c:229-338); the
    uint8 handoff between quantized layers (network.c:247-251) has no analog
    here — this is the float/QAT graph; integer inference is a separate
    compiled program built by infer/convert.py.
    """
    qs = dict(quant_state) if quant_state is not None else None
    if mode.qat and qs is None:
        raise ValueError("QAT forward requires quant_state")

    if mode.qat:
        lo, hi = qs["input"]["min"], qs["input"]["max"]
        if mode.update_ranges:
            lo, hi = ema_update(lo, hi, jnp.min(x), jnp.max(x))
            qs["input"] = {"min": lo, "max": hi}
        x = fake_quant(x, lo, hi)

    outputs: list[jax.Array] = []
    heads: list[jax.Array] = []
    bn_stats: dict[int, tuple[jax.Array, jax.Array]] = {}

    for i, s in enumerate(net.specs):
        if isinstance(s, ConvSpec):
            in_key = f"in_{i}"
            if mode.qat and qs is not None and in_key in qs:
                # float -> quant boundary: fake-quant the input (EMA-tracked)
                lo, hi = qs[in_key]["min"], qs[in_key]["max"]
                if mode.update_ranges:
                    lo, hi = ema_update(lo, hi, jnp.min(x), jnp.max(x))
                    qs[in_key] = {"min": lo, "max": hi}
                x = fake_quant(x, lo, hi)
            key = f"act_{i}"
            y, stats, new_state = _conv_forward(
                s, params[i], x, mode, qs.get(key) if qs else None
            )
            if stats is not None:
                bn_stats[i] = stats
            if qs is not None and new_state is not None and key in qs:
                qs[key] = new_state
        elif isinstance(s, MaxPoolSpec):
            y = L.maxpool(x, s.size, s.stride, s.padding)
        elif isinstance(s, UpsampleSpec):
            y = L.upsample_nearest(x, s.stride)
        elif isinstance(s, RouteSpec):
            y = L.route_concat([outputs[j] for j in s.layers])
            key = f"act_{i}"
            if mode.qat and qs is not None and key in qs:
                lo, hi = qs[key]["min"], qs[key]["max"]
                if mode.update_ranges:
                    lo, hi = ema_update(lo, hi, jnp.min(y), jnp.max(y))
                    qs[key] = {"min": lo, "max": hi}
                y = fake_quant(y, lo, hi)
        elif isinstance(s, ShortcutSpec):
            y = L.shortcut_add(x, outputs[s.index])
            y = L.activate(y, s.activation)
            key = f"act_{i}"
            if mode.qat and qs is not None and key in qs:
                lo, hi = qs[key]["min"], qs[key]["max"]
                if mode.update_ranges:
                    lo, hi = ema_update(lo, hi, jnp.min(y), jnp.max(y))
                    qs[key] = {"min": lo, "max": hi}
                y = fake_quant(y, lo, hi)
        elif isinstance(s, YoloSpec):
            y = x  # heads are decoded separately (eval/detect.py)
            heads.append(x)
        else:
            raise TypeError(f"unknown spec {s}")
        outputs.append(y)
        x = y

    aux = {"bn_stats": bn_stats, "quant_state": qs}
    return heads, aux
