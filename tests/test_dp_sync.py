"""dp_sync='dispatch' — the TPU-native dist_async analog (local SGD).

The reference's kvstore offers two transports (SURVEY.md §2d,
mxnet:src/kvstore/kvstore_dist.cc): ``dist_sync`` (every worker's gradient
merged every step) and ``dist_async`` (workers push/pull against the
parameter server without a barrier, tolerating unbounded staleness for
throughput). On TPU the idiomatic form of that trade is bounded-staleness
local SGD: K un-reduced local optimizer steps per dispatched program, then
ONE parameter-space pmean (params + momentum + BN stats) at the dispatch
boundary (train/steps.py sync_state).

Semantic pins:

  - K=1 dispatch-sync ≡ step-sync EXACTLY (modulo fp reassociation): the
    shipped optimizer's update is linear in the gradient (train/optim.py —
    mxnet_sgd's momentum rule, NAG, and the radial projection all are), so
    pmean-after-update equals update-after-pmean. Tested at a production
    learning rate: a broken/no-op sync would leave per-replica local
    updates whose divergence is O(lr * grad-variance), orders above the
    reassociation noise floor.
  - K>1 is the throughput/staleness trade: the trajectory deviates from
    step-sync at O(lr^2) (second order — replicas drift O(lr) apart within
    a phase, gradients differ by drift * curvature). At tiny lr the K=3
    dispatch trajectory must land within linearized-noise of step-sync;
    counts/finiteness/replica-consistency pin the mechanics.
  - GSPMD jit mode has no seam for a deferred-sync schedule; requesting it
    raises.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import Config
from resnet_tpu.ops import augment
from resnet_tpu.parallel.mesh import (batch_sharded, make_mesh,
                                      stacked_batch_sharded)
from resnet_tpu.train.state import create_train_state
from resnet_tpu.train.steps import make_train_step

K = 3
TINY_LR = 1e-4


def _cfg(**train_kw):
    cfg = Config()
    cfg.data = dataclasses.replace(
        cfg.data, num_classes=10, image_shape=(16, 16, 3))
    cfg.model = dataclasses.replace(cfg.model, depth=20, dataset="cifar10")
    cfg.train = dataclasses.replace(cfg.train, batch_size=16,
                                    dp_mode="shard_map", **train_kw)
    return cfg


def _batches(cfg, k=K, seed=11):
    rng = np.random.default_rng(seed)
    bs = cfg.train.batch_size
    return [{
        "image": rng.integers(0, 256, (bs, 16, 16, 3), dtype=np.uint8),
        "label": rng.integers(0, 10, (bs,), dtype=np.int32),
    } for _ in range(k)]


def _stack(batches):
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def _aug_fn(cfg):
    d = cfg.data
    return lambda imgs, rng, dims=None: augment.augment_cifar(
        imgs, rng, d, jnp.float32)


def _leafwise(a, b, rtol, atol):
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(a),
            jax.tree_util.tree_leaves_with_path(b)):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(p1))


def _full(state):
    return jax.device_get(
        (state.params, state.batch_stats, state.opt_state))


def _run(cfg, mesh, dp_sync, batches, k):
    aug = _aug_fn(cfg)
    step = make_train_step(mesh=mesh, dp_mode="shard_map", augment_fn=aug,
                           steps_per_dispatch=k, dp_sync=dp_sync)
    if k > 1:
        payload = jax.device_put(_stack(batches), stacked_batch_sharded(mesh))
    else:
        (b,) = batches
        payload = jax.device_put(b, batch_sharded(mesh))
    state, m = step(create_train_state(cfg), payload)
    return state, jax.device_get(m)


class TestDispatchSyncEquivalence:
    def test_k1_matches_step_sync_at_production_lr(self):
        """pmean(update(g_r)) == update(pmean(g_r)) — the linearity pin.

        One step at lr=0.05: if sync_state dropped a tree (momentum, BN
        stats) or never ran, the replicated output would be a single
        replica's local update, off by O(lr * per-replica grad spread)
        ~1e-2; fp reassociation of the two pmean orderings sits ~1e-6.
        """
        cfg = _cfg(lr=0.05)
        mesh = make_mesh(8)
        batches = _batches(cfg, k=1)
        s_step, m_step = _run(cfg, mesh, "step", batches, k=1)
        s_disp, m_disp = _run(cfg, mesh, "dispatch", batches, k=1)
        for key in m_step:
            np.testing.assert_allclose(m_disp[key], m_step[key], rtol=1e-5,
                                       err_msg=key)
        _leafwise(_full(s_step), _full(s_disp), rtol=1e-4, atol=1e-6)

    def test_k1_with_bn_ema_optimizer(self):
        # the shipped imagenet preset's optimizer chain (radial projection
        # + mxnet_sgd) must satisfy the same linearity identity
        cfg = _cfg(lr=0.05, bn_ema=True)
        mesh = make_mesh(8)
        batches = _batches(cfg, k=1)
        s_step, _ = _run(cfg, mesh, "step", batches, k=1)
        s_disp, _ = _run(cfg, mesh, "dispatch", batches, k=1)
        _leafwise(_full(s_step), _full(s_disp), rtol=1e-4, atol=1e-6)

    def test_k3_tiny_lr_tracks_step_sync(self):
        """Bounded staleness, leaf class by leaf class: gradient-updated
        leaves (params, momentum) deviate from step-sync at O(lr^2)
        (replicas drift O(lr) apart within the phase; gradients differ by
        drift * curvature) — ~1e-8 at lr=1e-4, far under the 1e-5 bar.
        BN running stats are NOT gradient-scaled: they track per-replica
        batch statistics evaluated at the drifted params, so their
        deviation is first-order, O(lr*(K-1)) ~ a few e-5 (measured
        2.5e-5) — bounded at 2e-4, which still sits ~100x under the
        ~(1-bn_mom)*batch-stat-spread ~3e-2 a dropped stats sync leaves."""
        cfg = _cfg(lr=TINY_LR)
        mesh = make_mesh(8)
        batches = _batches(cfg)
        s_step, m_step = _run(cfg, mesh, "step", batches, k=K)
        s_disp, m_disp = _run(cfg, mesh, "dispatch", batches, k=K)
        for key in m_step:
            np.testing.assert_allclose(m_disp[key], m_step[key], rtol=1e-4,
                                       err_msg=key)
        _leafwise(jax.device_get((s_step.params, s_step.opt_state)),
                  jax.device_get((s_disp.params, s_disp.opt_state)),
                  rtol=1e-4, atol=1e-5)
        _leafwise(jax.device_get(s_step.batch_stats),
                  jax.device_get(s_disp.batch_stats),
                  rtol=1e-3, atol=2e-4)


class TestDispatchSyncMechanics:
    def test_k3_counts_and_finiteness(self):
        cfg = _cfg()
        mesh = make_mesh(8)
        state, m = _run(cfg, mesh, "dispatch", _batches(cfg), k=K)
        assert m["count"] == K * cfg.train.batch_size
        assert np.isfinite(m["loss_sum"])
        assert int(state.step) == K
        for leaf in jax.tree.leaves(_full(state)):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_output_state_is_replica_consistent(self):
        """After the boundary pmean every replica holds the same state:
        re-dispatching from the synced state with step-sync must produce
        identical metrics to doing so from an explicitly re-replicated
        copy (a desynced state would disagree through the BN stats)."""
        cfg = _cfg()
        mesh = make_mesh(8)
        state, _ = _run(cfg, mesh, "dispatch", _batches(cfg), k=K)
        # round-trip through host: collapses whatever the device holds to
        # the advertised replicated value
        host = jax.device_get(state)
        aug = _aug_fn(cfg)
        step = make_train_step(mesh=mesh, dp_mode="shard_map",
                               augment_fn=aug, dp_sync="step")
        (b,) = _batches(cfg, k=1, seed=99)
        payload = jax.device_put(b, batch_sharded(mesh))
        _, m_dev = step(state, payload)
        _, m_host = step(jax.device_put(host), payload)
        m_dev, m_host = jax.device_get((m_dev, m_host))
        for key in m_dev:
            np.testing.assert_allclose(m_host[key], m_dev[key], rtol=1e-6,
                                       err_msg=key)

    def test_dispatch_requires_shard_map(self):
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="shard_map"):
            make_train_step(mesh=mesh, dp_mode="jit", dp_sync="dispatch")

    def test_unknown_dp_sync_rejected(self):
        with pytest.raises(ValueError, match="dp_sync"):
            make_train_step(mesh=None, dp_sync="bogus")
