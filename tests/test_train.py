"""Training tests: loss sanity, gradient flow, QAT phase flip, data-parallel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_quantization_tpu.models import zoo
from yolo_quantization_tpu.parallel import mesh as pmesh
from yolo_quantization_tpu.train.loss import MAX_BOXES, total_loss, yolo_head_loss
from yolo_quantization_tpu.train.qat import TrainConfig, Trainer, make_train_step, init_train_state
from yolo_quantization_tpu.nn.graph import ForwardMode, forward


def make_truths(batch, boxes):
    """boxes: list of (x, y, w, h, cls) in relative coords."""
    t = np.zeros((batch, MAX_BOXES, 5), np.float32)
    for b in range(batch):
        for i, bx in enumerate(boxes):
            t[b, i] = bx
    return jnp.asarray(t)


@pytest.fixture(scope="module")
def tiny_net():
    return zoo.yolov3_tiny(classes=5, width=160, height=160)


class TestYoloLoss:
    def test_empty_truths_only_background_loss(self, tiny_net):
        raw = jnp.zeros((1, 5, 5, 30))
        truths = make_truths(1, [])
        loss, stats = yolo_head_loss(
            raw, truths, (3, 4, 5), zoo.NOK_TINY_ANCHORS, 5, 160, 160
        )
        # all-zero logits -> obj sigmoid 0.5 -> bce = log(2) per cell
        expected = 5 * 5 * 3 * np.log(2.0)
        assert float(loss) == pytest.approx(expected, rel=1e-5)
        assert int(stats["obj_count"]) == 0

    def test_truth_assignment_creates_positive_cell(self, tiny_net):
        raw = jnp.zeros((1, 5, 5, 30))
        # big box matching a large anchor (405x102 at 160px input ~ rel 2.5x0.64
        # is clipped; use w,h that best-match anchor idx 4 of the mask)
        truths = make_truths(1, [(0.5, 0.5, 0.9, 0.7, 2.0)])
        loss, stats = yolo_head_loss(
            raw, truths, (3, 4, 5), zoo.NOK_TINY_ANCHORS, 5, 160, 160
        )
        assert int(stats["obj_count"]) == 1
        assert float(loss) > 5 * 5 * 3 * np.log(2.0)  # extra box/cls terms

    def test_gradients_nonzero_and_finite(self, tiny_net):
        key = jax.random.PRNGKey(0)
        raw = jax.random.normal(key, (2, 5, 5, 30)) * 0.1
        truths = make_truths(2, [(0.3, 0.4, 0.2, 0.3, 1.0)])

        def f(r):
            l, _ = yolo_head_loss(
                r, truths, (3, 4, 5), zoo.NOK_TINY_ANCHORS, 5, 160, 160
            )
            return l

        g = jax.grad(f)(raw)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self, tiny_net):
        cfg = TrainConfig(learning_rate=5e-4, burn_in=0, quant_start_step=10**9)
        trainer = Trainer(tiny_net, cfg, key=jax.random.PRNGKey(0))
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3))
        truths = make_truths(2, [(0.5, 0.5, 0.4, 0.4, 0.0)])
        losses = [float(trainer.step(images, truths)["loss"]) for _ in range(8)]
        assert losses[-1] < losses[0], losses

    def test_qat_step_updates_ranges(self, tiny_net):
        cfg = TrainConfig(burn_in=0, quant_start_step=0)
        trainer = Trainer(tiny_net, cfg, key=jax.random.PRNGKey(0))
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3))
        truths = make_truths(2, [(0.5, 0.5, 0.4, 0.4, 0.0)])
        trainer.step(images, truths)
        qs = trainer.state.quant_state
        assert float(qs["input"]["max"]) > 0
        assert float(qs["act_0"]["max"]) != 0

    def test_bn_rolling_stats_updated(self, tiny_net):
        cfg = TrainConfig(burn_in=0, quant_start_step=10**9)
        trainer = Trainer(tiny_net, cfg, key=jax.random.PRNGKey(0))
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3)) + 1.0
        truths = make_truths(2, [])
        before = np.asarray(trainer.state.params[0]["mean"]).copy()
        trainer.step(images, truths)
        after = np.asarray(trainer.state.params[0]["mean"])
        assert not np.allclose(before, after)


class TestDataParallel:
    def test_step_on_8_device_mesh(self, tiny_net):
        """One jitted QAT train step with the batch sharded over 8 CPU devices."""
        mesh = pmesh.make_mesh()
        assert mesh.devices.size == 8
        cfg = TrainConfig(burn_in=0, quant_start_step=0)
        state = init_train_state(tiny_net, cfg, jax.random.PRNGKey(0))
        step = make_train_step(tiny_net, cfg, qat=True)
        images = jax.random.uniform(jax.random.PRNGKey(1), (8, 160, 160, 3))
        truths = make_truths(8, [(0.5, 0.5, 0.4, 0.4, 0.0)])
        with mesh:
            state = pmesh.replicate(mesh, state)
            images, truths = pmesh.shard_batch(mesh, images, truths)
            new_state, metrics = step(state, images, truths)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # params changed and are still replicated across devices
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.params, new_state.params,
        )
        assert sum(v for p in d.values() for v in p.values()) > 0


class TestYolov2Training:
    def test_region_trainer_step(self):
        """Trainer works end-to-end on a region-head (yolov2) model."""
        net = zoo.yolov2_tiny(classes=3, width=96, height=96)
        cfg = TrainConfig(burn_in=0, quant_start_step=10**9, learning_rate=1e-3)
        trainer = Trainer(net, cfg, key=jax.random.PRNGKey(0))
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))
        truths = make_truths(2, [(0.5, 0.5, 0.4, 0.4, 1.0)])
        losses = [float(trainer.step(images, truths)["loss"]) for _ in range(25)]
        assert np.isfinite(losses).all()
        # early steps oscillate (momentum + object_scale 5); converged tail
        # must sit well below the start
        assert np.mean(losses[-5:]) < losses[0] * 0.6, losses


class TestAdam:
    def test_adam_optimizer_trains(self, tiny_net):
        cfg = TrainConfig(learning_rate=1e-3, burn_in=0,
                          quant_start_step=10**9, adam=True)
        trainer = Trainer(tiny_net, cfg, key=jax.random.PRNGKey(0))
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3))
        truths = make_truths(2, [(0.5, 0.5, 0.4, 0.4, 0.0)])
        losses = [float(trainer.step(images, truths)["loss"]) for _ in range(6)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
