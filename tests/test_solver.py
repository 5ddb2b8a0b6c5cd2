"""Solver end-to-end tests on the virtual 8-device CPU mesh.

The TPU-world analog of mxnet's Module/fit tests + the local-process
dist_sync test (SURVEY.md §4): tiny model, synthetic separable data, a few
fit steps -> loss decreases; checkpoint save -> resume -> bitwise state
match; both DP modes execute on the fake mesh.
"""

import os

import jax
import numpy as np
import pytest

from resnet_tpu.config import cifar10_resnet18
from resnet_tpu.data.loader import MemoryIter, synthetic_cifar
from resnet_tpu.train import checkpoint as ckpt
from resnet_tpu.train.solver import Solver
from resnet_tpu.train.state import create_train_state


def tiny_cfg(tmpdir="", num_devices=1, dp_mode="jit"):
    cfg = cifar10_resnet18()
    cfg.model.depth = 20
    cfg.data.num_examples = 256
    cfg.data.image_shape = (16, 16, 3)
    cfg.train.batch_size = 32
    cfg.train.num_epochs = 2
    cfg.train.frequent = 2
    cfg.train.lr = 0.05
    cfg.train.model_prefix = os.path.join(tmpdir, "ck") if tmpdir else ""
    cfg.train.num_devices = num_devices
    cfg.train.dp_mode = dp_mode
    # fast-converging BN running stats so eval-mode checks stabilize in a
    # handful of steps (bn_mom=0.9 needs ~50 steps to warm up)
    cfg.model.bn_mom = 0.5
    return cfg


class TestFit:
    @pytest.mark.parametrize("dp_mode,ndev", [
        ("jit", 1), ("jit", 8), ("shard_map", 8)])
    def test_loss_decreases(self, dp_mode, ndev):
        cfg = tiny_cfg(num_devices=ndev, dp_mode=dp_mode)
        solver = Solver(cfg)
        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)
        it = MemoryIter(images, labels, 32, seed=0)
        state = solver.init_state()
        state = solver.train_epoch(state, it, 0)
        m1 = dict(solver.last_train_metrics)
        state = solver.train_epoch(state, it, 1)
        state = solver.train_epoch(state, it, 2)
        m3 = dict(solver.last_train_metrics)
        assert m3["cross-entropy"] < m1["cross-entropy"]
        assert m3["accuracy"] >= m1["accuracy"]
        # eval path runs and returns the metric trio
        v = solver.validate(state, it, 2)
        assert set(v) == {"accuracy", "top_k_accuracy_5", "cross-entropy"}

    def test_dp_modes_agree(self):
        """GSPMD jit vs explicit shard_map psum: same data, same init ->
        both must learn; exact equality NOT expected (BN semantics differ:
        global-batch vs per-replica stats — SURVEY.md §7 hard part 3)."""
        images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=1)
        accs = {}
        for mode in ["jit", "shard_map"]:
            # 4 devices -> per-replica batch 8: per-replica BN stats are
            # usable (at 4/replica the BN noise genuinely stalls learning,
            # which is faithful to MXNet per-GPU BN but not a useful test)
            cfg = tiny_cfg(num_devices=4, dp_mode=mode)
            solver = Solver(cfg)
            it = MemoryIter(images, labels, 32, seed=0)
            state = solver.init_state()
            for ep in range(6):
                state = solver.train_epoch(state, it, ep)
            # train-mode accuracy: avoids BN running-stat warm-up noise
            accs[mode] = solver.last_train_metrics["accuracy"]
        assert accs["jit"] > 0.6 and accs["shard_map"] > 0.6, accs

    def test_shard_map_matches_jit_single_device(self):
        """On ONE device the two DP modes are the same math — outputs must
        match to numerical noise (catches psum/pmean bookkeeping bugs)."""
        import jax.numpy as jnp
        from resnet_tpu.train.steps import make_train_step
        from resnet_tpu.parallel.mesh import make_mesh
        cfg = tiny_cfg(num_devices=1)
        mesh = make_mesh(1)
        images, labels = synthetic_cifar(32, 10, (16, 16, 3), seed=2)
        batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
        outs = {}
        for mode in ["jit", "shard_map"]:
            state = create_train_state(cfg)
            step = make_train_step(mesh, dp_mode=mode)
            new_state, metrics = step(state, batch)
            outs[mode] = (jax.tree.leaves(new_state.params)[0],
                          metrics["loss_sum"])
        np.testing.assert_allclose(np.asarray(outs["jit"][0]),
                                   np.asarray(outs["shard_map"][0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(outs["jit"][1]),
                                   float(outs["shard_map"][1]), rtol=1e-5)


class TestCheckpoint:
    def test_save_restore_bitwise(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        state = create_train_state(cfg)
        ckpt.save_checkpoint(cfg.train.model_prefix, 3, state,
                             iter_state={"epoch": 3})
        state2 = create_train_state(cfg.replace())  # fresh init
        restored, iter_state = ckpt.load_checkpoint(
            cfg.train.model_prefix, 3, state2)
        assert iter_state == {"epoch": 3}
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ckpt.latest_epoch(cfg.train.model_prefix) == 3

    def test_resume_continues_training(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        cfg.train.num_epochs = 1
        solver = Solver(cfg)
        images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=0)
        it = MemoryIter(images, labels, 32, seed=0)
        state = solver.fit(it, None, num_epochs=1)
        step_after_1 = int(state.step)

        cfg2 = tiny_cfg(str(tmp_path))
        cfg2.train.load_epoch = 1
        cfg2.train.num_epochs = 2
        solver2 = Solver(cfg2)
        state2 = solver2.fit(it, None, num_epochs=2)
        assert int(state2.step) == 2 * step_after_1
        assert solver2.begin_epoch == 1


class TestReproducibility:
    def test_same_seed_bitwise_identical(self):
        """Two fits with the same seed produce bitwise-identical params —
        the determinism guarantee the reference can't make (C++ thread-
        local aug RNGs)."""
        results = []
        for _ in range(2):
            cfg = tiny_cfg()
            cfg.train.num_epochs = 2
            solver = Solver(cfg)
            images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=3)
            it = MemoryIter(images, labels, 32, seed=0)
            state = solver.fit(it, None, num_epochs=2)
            results.append(jax.tree.leaves(state.params))
        for a, b in zip(*results):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAutoResume:
    def test_picks_latest(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        state = create_train_state(cfg)
        ckpt.save_checkpoint(cfg.train.model_prefix, 5, state)
        cfg2 = tiny_cfg(str(tmp_path))
        cfg2.train.auto_resume = True
        solver = Solver(cfg2)
        solver.init_state()
        assert solver.begin_epoch == 5

    def test_no_checkpoint_starts_fresh(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path / "empty"))
        cfg.train.auto_resume = True
        solver = Solver(cfg)
        solver.init_state()
        assert solver.begin_epoch == 0


class TestMetricWriter:
    def test_jsonl_written(self, tmp_path):
        import json
        cfg = tiny_cfg(str(tmp_path))
        cfg.train.num_epochs = 1
        cfg.train.frequent = 2
        solver = Solver(cfg)
        images, labels = synthetic_cifar(128, 10, (16, 16, 3), seed=0)
        it = MemoryIter(images, labels, 32, seed=0)
        solver.fit(it, it, num_epochs=1)
        lines = [json.loads(ln) for ln in
                 open(cfg.train.model_prefix + ".metrics.jsonl")]
        splits = {ln["split"] for ln in lines}
        assert "train" in splits and "val" in splits
        assert all("accuracy" in ln for ln in lines)


class TestCheckpointRetention:
    def test_max_to_keep(self, tmp_path):
        cfg = tiny_cfg(str(tmp_path))
        state = create_train_state(cfg)
        for ep in [1, 2, 3]:
            ckpt.save_checkpoint(cfg.train.model_prefix, ep, state,
                                 max_to_keep=2)
        assert ckpt.latest_epoch(cfg.train.model_prefix) == 3
        restored, _ = ckpt.load_checkpoint(cfg.train.model_prefix, 2, state)
        assert int(restored.step) == 0
        with pytest.raises(Exception):
            ckpt.load_checkpoint(cfg.train.model_prefix, 1, state)


class TestSpeedometerAutoReset:
    def test_reset_fn_called(self):
        from resnet_tpu.train.callback import BatchEndParam, Speedometer
        calls = []
        sp = Speedometer(batch_size=8, frequent=2, auto_reset=True)
        for nb in range(1, 5):
            sp(BatchEndParam(epoch=0, nbatch=nb, metrics={"accuracy": 1.0}),
               reset_fn=lambda: calls.append(nb))
        assert calls == [2, 4]


class TestSpeedometerFormat:
    def test_log_line_shape(self, caplog):
        import logging
        from resnet_tpu.train.callback import BatchEndParam, Speedometer
        sp = Speedometer(batch_size=32, frequent=2)
        logger = logging.getLogger("resnet_tpu")
        logger.propagate = True  # let caplog's root handler see records
        logger.setLevel(logging.INFO)
        with caplog.at_level(logging.INFO, logger="resnet_tpu"):
            for nb in range(1, 5):
                sp(BatchEndParam(epoch=0, nbatch=nb,
                                 metrics={"accuracy": 0.5}, lr=0.1))
        lines = [r.getMessage() for r in caplog.records]
        assert any("Speed:" in ln and "samples/sec" in ln and
                   "Epoch[0]" in ln for ln in lines)


class TestMultiStepDispatch:
    """Solver path of train.steps_per_dispatch (K-step scanned program),
    incl. the epoch tail (< K batches) running the single-step fallback."""

    def _run(self, spd, tmpdir="", **train_kw):
        cfg = tiny_cfg(tmpdir)
        cfg.train.steps_per_dispatch = spd
        for k, v in train_kw.items():
            setattr(cfg.train, k, v)
        solver = Solver(cfg)
        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)
        it = MemoryIter(images, labels, 32, seed=0)
        state = solver.init_state()
        state = solver.train_epoch(state, it, 0)
        return solver, state

    def test_matches_single_dispatch_tiny_lr(self):
        # 8 batches/epoch with spd=3 -> dispatches of 3+3 then a 2-batch
        # single-step tail. Tiny lr linearizes the dynamics so the scanned
        # trajectory matches sequential to ~reassociation noise (the same
        # chaos argument as tests/test_multistep.py).
        outs = {}
        for spd in (1, 3):
            _, state = self._run(spd, lr=1e-4)
            outs[spd] = jax.device_get(
                (state.params, state.batch_stats, state.opt_state))
        for (p1, l1), (p2, l2) in zip(
                jax.tree_util.tree_leaves_with_path(outs[1]),
                jax.tree_util.tree_leaves_with_path(outs[3])):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(p1))

    def test_learns_and_checkpoints_mid_epoch(self, tmp_path):
        # checkpoint_frequent=4 with spd=3 crosses the boundary at
        # nbatch 6 (crossing check, not exact multiple) — a mid-epoch
        # save must land with the data cursor
        solver, state = self._run(3, tmpdir=str(tmp_path),
                                  checkpoint_frequent=4)
        m1 = dict(solver.last_train_metrics)
        assert ckpt.latest_epoch(solver.cfg.train.model_prefix) == 0
        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)
        it = MemoryIter(images, labels, 32, seed=0)
        for ep in (1, 2):
            state = solver.train_epoch(state, it, ep)
        assert solver.last_train_metrics["cross-entropy"] \
            < m1["cross-entropy"]


class TestAugmentImplSelection:
    """Mosaic kernels cannot be GSPMD-auto-partitioned: the Pallas
    augmentation path must never be selected under a >1-device ``jit``
    mesh (the AOT pod audit, tools/pod_compile_probe.py --pallas-aug,
    reproduces the Mosaic compile error this guard prevents)."""

    def test_pallas_rejected_under_multidevice_jit(self):
        from resnet_tpu.config import Config
        from resnet_tpu.train.solver import _augment_fns
        cfg = Config()   # imagenet-shaped: the impl selector applies
        cfg.data.augment_impl = "pallas"
        with pytest.raises(ValueError, match="shard_map"):
            _augment_fns(cfg, multi_device_jit=True)

    def test_auto_and_single_device_still_build(self):
        from resnet_tpu.config import Config
        from resnet_tpu.train.solver import _augment_fns
        cfg = Config()
        cfg.data.augment_impl = "auto"
        train_fn, eval_fn = _augment_fns(cfg, multi_device_jit=True)
        assert train_fn is not None and eval_fn is not None
        cfg.data.augment_impl = "pallas"   # fine off the GSPMD-jit path
        train_fn, _ = _augment_fns(cfg, multi_device_jit=False)
        assert train_fn is not None


class TestAugS2D:
    """aug_s2d (round 4): the augmenter emits space-to-depth blocks that
    feed the pre-blocked stem — an execution switch, so a whole trained
    epoch must match the standard layout to float tolerance."""

    def _cfg(self, aug_s2d):
        cfg = tiny_cfg()
        cfg.model.dataset = "imagenet"
        cfg.model.depth = 18
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.num_classes = 10
        cfg.train.stem_s2d = True
        cfg.train.aug_s2d = aug_s2d
        return cfg

    def test_epoch_matches_standard_layout(self):
        images, labels = synthetic_cifar(128, 10, (32, 32, 3), seed=3)
        params = {}
        for s2d in (False, True):
            solver = Solver(self._cfg(s2d))
            it = MemoryIter(images, labels, 32, seed=0)
            state = solver.init_state()
            state = solver.train_epoch(state, it, 0)
            params[s2d] = state.params
        for a, b in zip(jax.tree.leaves(params[False]),
                        jax.tree.leaves(params[True])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_needs_stem_s2d(self):
        cfg = self._cfg(True)
        cfg.train.stem_s2d = False
        with pytest.raises(ValueError, match="aug-s2d"):
            Solver(cfg)

    def test_needs_v1(self):
        cfg = self._cfg(True)
        cfg.model.version = 2
        with pytest.raises(ValueError, match="aug-s2d"):
            Solver(cfg)


class TestCommDtype:
    """shard_map gradient all-reduce in bf16 (--dp-comm-dtype bfloat16):
    halves ICI bytes; matches GSPMD's implicit bf16 wgrad reduction and
    MXNet multi_precision's fp16 kvstore push (PERF_NOTES round 3j)."""

    def test_bf16_reduce_close_to_f32_and_types_preserved(self):
        import jax.numpy as jnp
        from resnet_tpu.parallel.mesh import make_mesh, shard_batch
        from resnet_tpu.train.steps import make_train_step
        cfg = tiny_cfg(num_devices=8, dp_mode="shard_map")
        mesh = make_mesh(8)
        images, labels = synthetic_cifar(32, 10, (16, 16, 3), seed=3)
        batch = shard_batch(mesh, {"image": np.asarray(images),
                                   "label": np.asarray(labels)})
        outs = {}
        for name, cd in [("f32", None), ("bf16", jnp.bfloat16)]:
            state = create_train_state(cfg)
            step = make_train_step(mesh, dp_mode="shard_map", comm_dtype=cd)
            new_state, metrics = step(state, batch)
            outs[name] = new_state
            # param dtypes unchanged by the comm cast
            assert all(l.dtype == jnp.float32
                       for l in jax.tree.leaves(new_state.params))
        for l32, l16 in zip(jax.tree.leaves(outs["f32"].params),
                            jax.tree.leaves(outs["bf16"].params)):
            np.testing.assert_allclose(
                np.asarray(l32), np.asarray(l16), rtol=0.02, atol=1e-3)
