"""Space-to-depth conv+pool rewrite exactness (convert._s2d_weights).

The s2d path phases 2x2 pixel blocks into channels and replaces the
following 2x2/s2 maxpool with an elementwise max over the 4 output phases.
It must be BIT-identical to the plain path on every downstream layer and
head (integer accumulation is order-invariant; max commutes with the
monotone per-channel epilogue).
"""

import copy

import jax
import numpy as np

from yolo_quantization_tpu.infer.engine import build_forward
from yolo_quantization_tpu.models.presets import flagship_program


def test_s2d_bit_identical_to_plain_path():
    prog = flagship_program(classes=5, size=64)
    s2d_layers = [i for i, c in enumerate(prog.cfg) if c.s2d_pool]
    assert s2d_layers == [0, 2, 4]  # the small-channel stem stages
    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    arrays = jax.device_put(prog.arrays)
    got_h, got_o = build_forward(prog, use_s2d=True, return_outputs=True)(arrays, x)

    plain = copy.deepcopy(prog)
    for c in plain.cfg:
        c.s2d_pool = False
    ref_h, ref_o = build_forward(plain, return_outputs=True)(
        jax.device_put(plain.arrays), x
    )
    for i, (a, b) in enumerate(zip(ref_o, got_o)):
        if i in s2d_layers:
            continue  # fused-away conv slot holds the pooled duplicate
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ref_h, got_h):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_skipped_for_referenced_convs():
    """A conv whose output feeds a route must not get the s2d rewrite."""
    from tests.test_fusion_plan import _net_with_near_miss_route, _program

    prog = _program(_net_with_near_miss_route())
    assert not prog.cfg[0].s2d_pool  # route4 references layer 0
    assert prog.cfg[2].s2d_pool      # conv2 is free to rewrite
