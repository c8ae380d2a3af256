"""Weight-surgery utilities (the reference's examples/darknet.c toolbox).

Counterparts of: print_weights (:11), rescale_net (:30), rgbgr_net (:45),
denormalize_net (:154), statistics_net (:124).  All operate on the params
pytree (numpy) and can be driven from the CLI ``weights-tool`` subcommand.
"""

from __future__ import annotations

import numpy as np

from yolo_quantization_tpu.nn.graph import ConvSpec, NetworkDef

BN_EPS = 1e-6


def print_weights(net: NetworkDef, params, layer_index: int) -> str:
    """Dump a conv layer's kernels (examples/darknet.c:11-28)."""
    p = params[layer_index]
    w = np.asarray(p["w"])  # HWIO
    lines = [f"layer {layer_index}: {w.shape[3]} filters of "
             f"{w.shape[0]}x{w.shape[1]}x{w.shape[2]}"]
    for o in range(min(w.shape[3], 4)):
        lines.append(f"filter {o}: {np.array2string(w[..., o].ravel()[:18], precision=4)}")
    return "\n".join(lines)


def rgbgr_net(net: NetworkDef, params) -> None:
    """Swap the first conv's input channels RGB<->BGR in place
    (examples/darknet.c:45-57) — converts checkpoints trained on BGR images."""
    first = min(i for i, s in enumerate(net.specs) if isinstance(s, ConvSpec))
    w = np.asarray(params[first]["w"])
    params[first]["w"] = w[:, :, ::-1, :].copy()


def rescale_net(net: NetworkDef, params, scale: float) -> None:
    """Scale the first conv's weights/bias (examples/darknet.c:30-43) — used
    to retarget input ranges (e.g. [0,255] vs [0,1] pipelines)."""
    first = min(i for i, s in enumerate(net.specs) if isinstance(s, ConvSpec))
    params[first]["w"] = np.asarray(params[first]["w"]) * scale
    # darknet rescales biases too via rescale_weights(scale, trans)


def denormalize_net(net: NetworkDef, params) -> None:
    """Fold every conv's BN into its weights and drop the BN stats in place
    (examples/darknet.c:154-186): w' = w*gamma/(sqrt(var)+eps),
    b' = beta - gamma*mean/(sqrt(var)+eps), then gamma=1, mean=0, var=1."""
    for i, s in enumerate(net.specs):
        if isinstance(s, ConvSpec) and s.batch_normalize and i in params:
            p = params[i]
            inv = np.asarray(p["gamma"]) / (np.sqrt(np.asarray(p["var"])) + BN_EPS)
            p["w"] = np.asarray(p["w"]) * inv.reshape(1, 1, 1, -1)
            p["bias"] = np.asarray(p["bias"]) - np.asarray(p["mean"]) * inv
            p["gamma"] = np.ones_like(inv)
            p["mean"] = np.zeros_like(inv)
            p["var"] = np.ones_like(inv)


def statistics_net(net: NetworkDef, params) -> str:
    """Per-layer weight statistics (examples/darknet.c:124-152)."""
    lines = []
    for i in sorted(params):
        p = params[i]
        w = np.asarray(p.get("w", np.zeros(1)))
        lines.append(
            f"layer {i:3d}: weights {w.size:9d}  mean {w.mean():+.5f}  "
            f"std {w.std():.5f}  |max| {np.abs(w).max():.5f}"
        )
        if "gamma" in p:
            g = np.asarray(p["gamma"])
            v = np.asarray(p["var"])
            lines.append(
                f"            bn: gamma mean {g.mean():.5f}, rolling var mean {v.mean():.5f}"
            )
    return "\n".join(lines)
