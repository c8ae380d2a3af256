"""Engine conv+pool fusion-plan safety (VERDICT r1 weak item 5).

The Pallas fusion plan replaces a conv's output with the pooled tensor; any
graph consumer indexing the fused-away output would silently read pooled
data.  These tests pin the guard: a route that references the conv keeps it
out of the plan, and the engine still produces bit-identical results.
"""

import jax
import numpy as np

from yolo_quantization_tpu.infer.convert import convert
from yolo_quantization_tpu.infer.engine import build_forward
from yolo_quantization_tpu.nn.graph import (
    ConvSpec,
    ForwardMode,
    MaxPoolSpec,
    NetworkDef,
    RouteSpec,
    YoloSpec,
    forward,
    init_params,
    init_quant_state,
)


def _net_with_near_miss_route():
    """conv0 -> pool1 -> conv2 -> pool3 -> route4([0]) -> conv5 -> yolo.

    conv0's following pool makes it a fusion candidate — but route4 indexes
    layer 0, so the plan must exclude it.  conv2 stays fusable.
    """
    anchors = ((10.0, 14.0), (23.0, 27.0), (37.0, 58.0))
    return NetworkDef(
        specs=(
            ConvSpec(filters=16, size=3, stride=1, pad=1, activation="relu6"),
            MaxPoolSpec(size=2, stride=2),
            ConvSpec(filters=32, size=3, stride=1, pad=1, activation="relu6"),
            MaxPoolSpec(size=2, stride=2),
            RouteSpec(layers=(0,)),
            ConvSpec(filters=24, size=1, stride=1, pad=0, activation="linear",
                     batch_normalize=False, quant_stop=True),
            YoloSpec(mask=(0, 1, 2), anchors=anchors, classes=3),
        ),
        width=32,
        height=32,
    )


def _program(net):
    params = init_params(jax.random.PRNGKey(0), net)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, net.height, net.width, 3))
    qs = init_quant_state(net)
    _, aux = forward(
        net, params, x, ForwardMode(train=False, qat=True, update_ranges=True), qs
    )
    return convert(net, params, aux["quant_state"])


def test_route_referenced_conv_stays_unfused():
    prog = _program(_net_with_near_miss_route())
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    arrays = jax.device_put(prog.arrays)
    ref = build_forward(prog, use_pallas=False)(arrays, x)
    got = build_forward(prog, use_pallas=True, pallas_interpret=True)(arrays, x)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_layer_outputs_route_sees_conv_not_pool():
    """outputs[0] consumed by the route must be the CONV output (32x32x16),
    never the pooled 16x16 tensor — shape check through the route concat."""
    net = _net_with_near_miss_route()
    prog = _program(net)
    x = np.zeros((1, 32, 32, 3), np.float32)
    arrays = jax.device_put(prog.arrays)
    _, outs = build_forward(prog, use_pallas=True, pallas_interpret=True,
                            return_outputs=True)(arrays, x)
    assert outs[0].shape == (1, 32, 32, 16)
    assert outs[4].shape == (1, 32, 32, 16)  # route passes conv0 through
