"""Train-core tests: LR schedule, MXNet SGD semantics, metrics.

Numeric oracles are tiny NumPy reimplementations of the documented MXNet
update rules (SURVEY.md §2b fused SGD op; ref:core/scheduler.py) — the
analog of mxnet's test_operator.py checking kernels against NumPy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from resnet_tpu.config import Config
from resnet_tpu.ops.metrics import (MetricAccumulator, cross_entropy_loss,
                                    metric_sums)
from resnet_tpu.train.optim import mxnet_sgd
from resnet_tpu.train.schedule import schedule_from_config, warmup_multifactor


class TestSchedule:
    def test_multifactor_steps(self):
        sched = warmup_multifactor(0.1, steps=[100, 200], factor=0.1)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(99)) == pytest.approx(0.1)
        assert float(sched(100)) == pytest.approx(0.01)
        assert float(sched(199)) == pytest.approx(0.01)
        assert float(sched(200)) == pytest.approx(0.001)

    def test_warmup_linear(self):
        sched = warmup_multifactor(0.4, steps=[1000], factor=0.1,
                                   warmup=True, warmup_lr=0.0,
                                   warmup_steps=100)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(50)) == pytest.approx(0.2)
        assert float(sched(100)) == pytest.approx(0.4)
        assert float(sched(1000)) == pytest.approx(0.04)

    def test_epoch_arithmetic(self):
        # ref:train_resnet.py: steps = epochs * num_examples // batch_size
        cfg = Config()
        cfg.data.num_examples = 1000
        cfg.train.batch_size = 100
        cfg.train.lr = 0.1
        cfg.train.lr_steps = (2, 4)
        sched = schedule_from_config(cfg)
        assert float(sched(19)) == pytest.approx(0.1)
        assert float(sched(20)) == pytest.approx(0.01)
        assert float(sched(40)) == pytest.approx(0.001)

    def test_jittable(self):
        sched = warmup_multifactor(0.1, steps=[10], warmup=True,
                                   warmup_steps=5)
        f = jax.jit(sched)
        assert float(f(jnp.asarray(3))) > 0


class TestMXNetSGD:
    def _numpy_oracle(self, w0, grads, lrs, momentum, wd, steps):
        """mxnet sgd_mom_update: mom = m*mom - lr*(g + wd*w); w += mom."""
        w = w0.copy()
        mom = np.zeros_like(w)
        for i in range(steps):
            mom = momentum * mom - lrs[i] * (grads[i] + wd * w)
            w = w + mom
        return w

    def test_matches_oracle_constant_lr(self):
        rng = np.random.default_rng(0)
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32)
                 for _ in range(5)]
        tx = mxnet_sgd(0.1, momentum=0.9, weight_decay=0.01)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
        expected = self._numpy_oracle(w0, grads, [0.1] * 5, 0.9, 0.01, 5)
        np.testing.assert_allclose(np.asarray(params["w"]), expected,
                                   rtol=1e-5)

    def test_lr_drop_keeps_momentum_magnitude(self):
        """The parity-critical difference from optax.sgd: accumulated
        momentum is NOT rescaled when the schedule drops the lr."""
        sched = warmup_multifactor(1.0, steps=[2], factor=0.1)
        tx = mxnet_sgd(sched, momentum=0.9, weight_decay=0.0)
        params = {"w": jnp.ones(())}
        state = tx.init(params)
        g = {"w": jnp.ones(())}
        lrs = [1.0, 1.0, 0.1, 0.1]
        expected = self._numpy_oracle(
            np.ones(()), [np.ones(())] * 4, lrs, 0.9, 0.0, 4)
        for _ in range(4):
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), expected,
                                   rtol=1e-6)

    def test_nag(self):
        # mxnet NAG: mom = m*mom + (g+wd*w); delta = -lr*(g+wd*w + m*mom)
        tx = mxnet_sgd(0.1, momentum=0.9, weight_decay=0.0, nesterov=True)
        params = {"w": jnp.zeros(())}
        state = tx.init(params)
        g = {"w": jnp.ones(())}
        updates, state = tx.update(g, state, params)
        # step 1: mom=1; delta = -0.1*(1+0.9*1) = -0.19
        assert float(updates["w"]) == pytest.approx(-0.19)

    def test_wd_applied_to_all_params(self):
        # MXNet default: wd hits BN gammas/betas too
        tx = mxnet_sgd(1.0, momentum=0.0, weight_decay=0.5)
        params = {"scale": jnp.ones(()), "kernel": jnp.ones(())}
        state = tx.init(params)
        zero_g = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(zero_g, state, params)
        assert float(updates["scale"]) == pytest.approx(-0.5)
        assert float(updates["kernel"]) == pytest.approx(-0.5)


class TestMetrics:
    def test_cross_entropy_matches_numpy(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(8, 10)).astype(np.float32)
        labels = rng.integers(0, 10, 8)
        p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        expected = -np.log(p[np.arange(8), labels]).mean()
        got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        assert float(got) == pytest.approx(expected, rel=1e-5)

    def test_topk(self):
        logits = jnp.asarray([
            [9, 8, 7, 6, 5, 4, 0, 0, 0, 0],   # label 5 -> rank 5 (not top5)
            [9, 8, 7, 6, 5, 4, 0, 0, 0, 0],   # label 4 -> rank 4 (top5)
            [0, 9, 0, 0, 0, 0, 0, 0, 0, 0],   # label 1 -> top1
        ], jnp.float32)
        labels = jnp.asarray([5, 4, 1])
        sums = metric_sums(logits, labels, jnp.asarray(0.0))
        assert float(sums["top1_sum"]) == 1
        assert float(sums["top5_sum"]) == 2
        assert float(sums["count"]) == 3

    def test_mask_excludes_padding(self):
        logits = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
        labels = jnp.asarray([1, 0])
        mask = jnp.asarray([1.0, 0.0])
        sums = metric_sums(logits, labels, jnp.asarray(0.0), mask=mask)
        assert float(sums["top1_sum"]) == 1
        assert float(sums["count"]) == 1

    def test_accumulator(self):
        acc = MetricAccumulator()
        acc.update({"top1_sum": 3, "top5_sum": 4, "loss_sum": 10.0,
                    "count": 5})
        acc.update({"top1_sum": 1, "top5_sum": 1, "loss_sum": 2.0,
                    "count": 5})
        m = acc.get()
        assert m["accuracy"] == pytest.approx(0.4)
        assert m["cross-entropy"] == pytest.approx(1.2)
        acc.reset()
        assert acc.get()["accuracy"] == 0.0
