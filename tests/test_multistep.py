"""Multi-step dispatch (train.steps_per_dispatch): scan-of-K ≡ K steps.

The K-step program (steps._scan_steps: lax.scan over K stacked batches) is
the TPU analog of the reference's dependency-engine run-ahead (SURVEY.md
§3.2: MXNet's Python loop queues batches ahead of the device; here K SGD
steps ride ONE dispatched XLA program). These tests pin the SEMANTICS: same
batch order, same per-step augmentation randomness (each scanned step folds
its own state.step), same gradient/optimizer/BN-stats math, same metric
sums.

What they deliberately do NOT pin is bit-level trajectory equality at K>1
with production learning rates: XLA compiles the scan body as a loop with
different fusion choices than the standalone step program, which injects
~1e-5-level reassociation noise per step, and SGD dynamics amplify that
chaotically (measured: 6e-5 after one scanned step -> 7e-3 after two —
the same signal-free-chaos finding the CPU/TPU device-parity gate
documents). The pins below are chosen to be chaos-free instead:

  - K=1 forced scan vs one plain dispatch: BITWISE equal (the wrapper adds
    no math — slicing, step folding and metric summing are exact);
  - K=3 at a tiny learning rate (linearized dynamics, no chaotic
    feedback): params/momentum/BN stats match sequential to ~reassociation
    noise. A semantic bug (wrong RNG fold, wrong batch slice, dropped
    psum) perturbs gradients O(1) and shows up at O(lr) >> the tolerance.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.config import Config
from resnet_tpu.ops import augment
from resnet_tpu.parallel.mesh import make_mesh, stacked_batch_sharded
from resnet_tpu.train.state import create_train_state
from resnet_tpu.train.steps import (_scan_steps, make_train_step,
                                    train_step)

K = 3
TINY_LR = 1e-4   # linearizes the dynamics: reassociation noise stays
                 # ~1e-6 while a semantic bug would move params by ~lr*K


def _cfg(**train_kw):
    cfg = Config()
    cfg.data = dataclasses.replace(
        cfg.data, num_classes=10, image_shape=(16, 16, 3))
    cfg.model = dataclasses.replace(cfg.model, depth=20, dataset="cifar10")
    cfg.train = dataclasses.replace(cfg.train, batch_size=16, **train_kw)
    return cfg


def _batches(cfg, k=K, seed=7):
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


class TestScanWrapperExact:
    def test_k1_scan_ulp_exact(self):
        """A length-1 scan is the plain step, to within compile ULPs.

        Pins that _scan_steps itself introduces no math: the batch
        slicing, the state.step fold into the augmentation key, and the
        metric accumulation are exact. The length-1 scan still compiles
        as its own XLA program, which lands 1-2 ULP (~2e-8) away on a
        few fused leaves under the 8-virtual-device test env — hence
        allclose at ULP scale, not assert_array_equal. (At K>1 the
        loop-body schedule diverges further — covered by the tiny-lr
        test below.)
        """
        cfg = _cfg()
        aug = _aug_fn(cfg)
        (b,) = _batches(cfg, k=1)

        state = create_train_state(cfg)
        step1 = make_train_step(mesh=None, augment_fn=aug)
        state, m1 = step1(state, jax.device_put(b))

        state_k = create_train_state(cfg)
        stepk = jax.jit(_scan_steps(partial(train_step, augment_fn=aug), 1),
                        donate_argnums=0)
        state_k, mk = stepk(state_k, jax.device_put(_stack([b])))

        m1, mk = jax.device_get((m1, mk))
        for key in m1:
            np.testing.assert_allclose(float(mk[key]), float(m1[key]),
                                       rtol=1e-6, err_msg=key)
        _leafwise(_full(state), _full(state_k), rtol=3e-6, atol=1e-7)


class TestScanMatchesSequential:
    """K-step scan vs K single dispatches at tiny lr (linearized)."""

    def _run_pair(self, cfg):
        aug = _aug_fn(cfg)
        batches = _batches(cfg)

        state = create_train_state(cfg)
        step1 = make_train_step(mesh=None, augment_fn=aug)
        seq_metrics = []
        for b in batches:
            state, m = step1(state, jax.device_put(b))
            seq_metrics.append(jax.device_get(m))

        state_k = create_train_state(cfg)
        stepk = make_train_step(mesh=None, augment_fn=aug,
                                steps_per_dispatch=K)
        state_k, mk = stepk(state_k, jax.device_put(_stack(batches)))
        return state, seq_metrics, state_k, jax.device_get(mk)

    def _assert_equal(self, state, seq_metrics, state_k, mk):
        assert int(state_k.step) == int(state.step) == K
        for key in mk:
            want = np.sum([m[key] for m in seq_metrics])
            np.testing.assert_allclose(mk[key], want, rtol=1e-4,
                                       err_msg=key)
        # a wrong RNG stream / batch slice moves params by ~TINY_LR*K
        # (3e-4); schedule noise sits ~two orders below this bar
        _leafwise(_full(state), _full(state_k), rtol=1e-4, atol=1e-5)

    def test_default_bn(self):
        self._assert_equal(*self._run_pair(_cfg(lr=TINY_LR)))

    def test_bn_ema(self):
        # the shipped imagenet_resnet50 BN mode (steady-state ema program,
        # radial-projection optimizer) must scan identically too
        self._assert_equal(*self._run_pair(_cfg(lr=TINY_LR, bn_ema=True)))

    def test_spd_unroll_matches_looped_scan(self):
        # the unrolled scan duplicates the step body so XLA can schedule
        # across step boundaries — same math as the looped scan
        cfg = _cfg(lr=TINY_LR)
        aug = _aug_fn(cfg)
        stacked = _stack(_batches(cfg))
        state_l = create_train_state(cfg)
        looped = make_train_step(mesh=None, augment_fn=aug,
                                 steps_per_dispatch=K)
        state_l, ml = looped(state_l, jax.device_put(stacked))
        state_u = create_train_state(cfg)
        unrolled = make_train_step(mesh=None, augment_fn=aug,
                                   steps_per_dispatch=K, spd_unroll=True)
        state_u, mu = unrolled(state_u, jax.device_put(stacked))
        ml, mu = jax.device_get((ml, mu))
        for key in ml:
            np.testing.assert_allclose(mu[key], ml[key], rtol=1e-4,
                                       err_msg=key)
        _leafwise(_full(state_l), _full(state_u), rtol=1e-4, atol=1e-5)


class TestScanSharded:
    def test_dp_jit_matches_single_device(self):
        cfg = _cfg(lr=TINY_LR)
        aug = _aug_fn(cfg)
        batches = _batches(cfg)
        stacked = _stack(batches)

        state_1 = create_train_state(cfg)
        step_1 = make_train_step(mesh=None, augment_fn=aug,
                                 steps_per_dispatch=K)
        state_1, m1 = step_1(state_1, jax.device_put(stacked))

        mesh = make_mesh(8)
        step_m = make_train_step(mesh=mesh, dp_mode="jit", augment_fn=aug,
                                 steps_per_dispatch=K)
        state_m, mm = step_m(
            create_train_state(cfg),
            jax.device_put(stacked, stacked_batch_sharded(mesh)))
        m1, mm = jax.device_get((m1, mm))
        for k in m1:
            np.testing.assert_allclose(mm[k], m1[k], rtol=1e-4, atol=1e-4,
                                       err_msg=k)
        # GSPMD re-associates the batch reduces (same story as
        # test_bn_subsample.test_multidevice_dp_modes); at tiny lr that
        # noise stays linear instead of compounding chaotically
        _leafwise(
            jax.device_get((state_1.params, state_1.batch_stats)),
            jax.device_get((state_m.params, state_m.batch_stats)),
            rtol=1e-3, atol=1e-4)

    def test_shard_map_runs_and_counts(self):
        # per-replica BN semantics differ from single-device by design;
        # pin execution, finiteness, and the metric count across K steps
        cfg = _cfg()
        aug = _aug_fn(cfg)
        mesh = make_mesh(8)
        stacked = _stack(_batches(cfg))
        step = make_train_step(mesh=mesh, dp_mode="shard_map",
                               augment_fn=aug, steps_per_dispatch=K)
        state, m = step(create_train_state(cfg),
                        jax.device_put(stacked, stacked_batch_sharded(mesh)))
        m = jax.device_get(m)
        assert m["count"] == K * cfg.train.batch_size
        assert np.isfinite(m["loss_sum"])
        assert int(state.step) == K
        for leaf in jax.tree.leaves(
                jax.device_get((state.params, state.batch_stats))):
            assert np.isfinite(np.asarray(leaf)).all()
