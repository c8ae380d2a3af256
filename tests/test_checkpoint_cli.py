"""Checkpoint round-trip and CLI smoke tests (CPU)."""

import subprocess
import sys

import jax
import numpy as np
import pytest

from yolo_quantization_tpu.models import zoo
from yolo_quantization_tpu.train import checkpoint as ckpt
from yolo_quantization_tpu.train.qat import TrainConfig, init_train_state


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        net = zoo.yolov3_tiny(classes=5, width=96, height=96)
        cfg = TrainConfig()
        state = init_train_state(net, cfg, jax.random.PRNGKey(0))
        state = state._replace(step=state.step + 7)
        d = str(tmp_path / "bk")
        ckpt.save_checkpoint(d, state)
        assert ckpt.latest_step(d) == 7
        template = init_train_state(net, cfg, jax.random.PRNGKey(1))
        restored = ckpt.restore_checkpoint(d, template)
        assert int(restored.step) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params[0]["w"]), np.asarray(state.params[0]["w"])
        )

    def test_cadence(self):
        assert ckpt.checkpoint_cadence(100)
        assert not ckpt.checkpoint_cadence(150)
        assert ckpt.checkpoint_cadence(10000)
        assert not ckpt.checkpoint_cadence(10100)


class TestCLI:
    def test_help_lists_subcommands(self):
        out = subprocess.run(
            [sys.executable, "-m", "yolo_quantization_tpu.cli", "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0
        for cmd in ("train", "detect", "f1", "export", "bench"):
            assert cmd in out.stdout
