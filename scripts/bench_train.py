"""Training throughput: jitted QAT step time + scaling curve (VERDICT r2 item 3).

The reference's flagship GPU mode is QAT training (examples/detector.c:8-156,
multi-GPU src/network.c:1164); this measures the TPU analog:

  chip     one-chip jitted QAT step at 416x416 (flagship config), batch
           configurable; compile time separated from steady-state step time.
           Timing uses the repo's scalar-fetch pattern: N steps queued on the
           device stream, the final loss fetch forces the chain (see
           docs/perf.md "Measurement pitfall").
  scaling  1->N virtual-CPU-device data-parallel scaling_efficiency curve
           (weak scaling: per-device batch fixed).  Virtual devices share one
           host's cores, so the curve measures sharding/collective overhead,
           not hardware speedup — real multi-chip numbers need a pod.

Usage:
  python scripts/bench_train.py chip [batch] [steps]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_train.py scaling
Prints one JSON line per result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _synthetic_batch(key, batch: int, size: int, classes: int = 5, max_boxes: int = 90):
    """Device-generated images + a plausible truth tensor (host uploads over
    the dev tunnel are minutes of wall clock)."""
    kx, kb = jax.random.split(key)
    images = jax.random.uniform(kx, (batch, size, size, 3), jnp.float32)
    # a handful of random boxes per image, rest zero (empty slots)
    nbox = 6
    xy = jax.random.uniform(kb, (batch, nbox, 2), minval=0.2, maxval=0.8)
    wh = jnp.full((batch, nbox, 2), 0.15, jnp.float32)
    cls = jax.random.randint(jax.random.fold_in(kb, 1), (batch, nbox, 1), 0, classes)
    truths = jnp.concatenate([xy, wh, cls.astype(jnp.float32)], axis=-1)
    truths = jnp.pad(truths, ((0, 0), (0, max_boxes - nbox), (0, 0)))
    return images, truths


def bench_chip(batch: int, steps: int, size: int = 416):
    from yolo_quantization_tpu.models.presets import flagship_network
    from yolo_quantization_tpu.train.qat import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    net = flagship_network()
    cfg = TrainConfig(batch_size=batch)
    state = init_train_state(net, cfg, jax.random.PRNGKey(0))
    step = make_train_step(net, cfg, qat=True)
    images, truths = jax.jit(
        lambda k: _synthetic_batch(k, batch, size)
    )(jax.random.PRNGKey(1))

    t0 = time.perf_counter()
    state, metrics = step(state, images, truths)
    float(metrics["loss"])  # force compile + first step
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, truths)
    loss = float(metrics["loss"])  # forces the chain
    dt = time.perf_counter() - t0
    out = {
        "metric": "qat_train_step",
        "size": size,
        "batch": batch,
        "steps": steps,
        "step_ms": round(1e3 * dt / steps, 2),
        "images_per_sec": round(steps * batch / dt, 1),
        "compile_plus_first_step_s": round(compile_s, 1),
        "loss": round(loss, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    return out


def bench_scaling(size: int = 160, per_device_batch: int = 8, iters: int = 8):
    from yolo_quantization_tpu.models.presets import flagship_network
    from yolo_quantization_tpu.parallel import mesh as pmesh
    from yolo_quantization_tpu.parallel.distributed import scaling_efficiency
    from yolo_quantization_tpu.train.qat import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    net = flagship_network(size=size)
    cfg = TrainConfig(batch_size=per_device_batch)
    step = make_train_step(net, cfg, qat=True)
    state0 = init_train_state(net, cfg, jax.random.PRNGKey(0))
    holder = {"state": state0}

    def step_fn(mesh, batch):
        if holder.get("mesh") is not mesh:
            from jax.sharding import NamedSharding, PartitionSpec

            holder["state"] = jax.device_put(
                state0, NamedSharding(mesh, PartitionSpec())
            )
            holder["mesh"] = mesh
        images, truths = batch
        with mesh:
            images, truths = pmesh.shard_batch(mesh, images, truths)
            holder["state"], metrics = step(holder["state"], images, truths)
        float(metrics["loss"])

    def make_batch(n):
        imgs, tr = _synthetic_batch(
            jax.random.PRNGKey(2), n * per_device_batch, size
        )
        return np.asarray(imgs), np.asarray(tr)

    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = scaling_efficiency(step_fn, make_batch, counts, iters=iters)
    base = results.get(1)
    out = {
        "metric": "qat_train_scaling_virtual_cpu",
        "size": size,
        "per_device_batch": per_device_batch,
        "images_per_sec": {str(k): round(v, 2) for k, v in results.items()},
        "weak_scaling_vs_1dev": {
            str(k): round(v / base, 3) for k, v in results.items()
        } if base else {},
        "note": "virtual devices share one host's cores; curve measures "
                "sharding overhead, not hardware speedup",
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "chip":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        bench_chip(batch, steps)
    elif mode == "scaling":
        # force the virtual CPU mesh regardless of the image's pinned TPU
        # platform (same trick as tests/conftest.py); flags/platform are read
        # lazily at backend init, which hasn't happened yet
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        bench_scaling()
    else:
        raise SystemExit(f"unknown mode {mode}")
