"""Checkpoint / resume via Orbax, mirroring the reference's cadence.

The reference saves darknet weight blobs every 100 iters to backup/<name>.backup
and every 10000 to numbered .weights files, with `seen` as the resume counter
(examples/detector.c:132-147, src/parser.c:959-976,1219-1225).  Here the full
TrainState (params, optimizer momentum, EMA quant ranges, step) round-trips
through Orbax, so resume is exact — including QAT phase and LR schedule
position.  models/darknet_weights.py provides the interchange path to the
reference's binary format.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from yolo_quantization_tpu.train.qat import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None) -> None:
    step = int(state.step) if step is None else step
    with _manager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: TrainState, step: int | None = None) -> TrainState:
    """Restore into the structure of ``template`` (from init_train_state)."""
    with _manager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        abstract = jax.tree.map(np.asarray, template._asdict())
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    return TrainState(**restored)


def checkpoint_cadence(step: int) -> bool:
    """darknet cadence: every 100 below 1000, else every 10000
    (examples/detector.c:132-147); the rolling .backup every 100 is subsumed
    by Orbax's max_to_keep rotation."""
    if step < 1000:
        return step % 100 == 0
    return step % 10000 == 0
