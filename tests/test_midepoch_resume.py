"""Mid-epoch checkpoint/resume, end to end.

The reference's restart story loses mid-epoch progress: checkpoints are
epoch-granular and optimizer state is not saved (SURVEY.md §3.4 quirk).
This framework exceeds it — ``--checkpoint-frequent N`` and the SIGTERM
handler save (state + optimizer + PRNG + data cursor) at batch
granularity, and resume replays the IDENTICAL remaining stream, so an
interrupted+resumed run is bitwise-equal to an uninterrupted one.
"""

import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from resnet_tpu.config import cifar10_resnet18
from resnet_tpu.data.loader import MemoryIter, synthetic_cifar
from resnet_tpu.train import checkpoint as ckpt
from resnet_tpu.train.solver import Solver


def _cfg(prefix, num_epochs=2):
    cfg = cifar10_resnet18()
    cfg.model.depth = 20
    cfg.model.bn_mom = 0.5
    cfg.data.num_examples = 256
    cfg.data.image_shape = (16, 16, 3)
    cfg.train.batch_size = 32
    cfg.train.num_epochs = num_epochs
    cfg.train.frequent = 2
    cfg.train.lr = 0.05
    cfg.train.model_prefix = prefix
    return cfg


class _InterruptingIter(MemoryIter):
    """Sets the solver's SIGTERM flag when batch ``at`` of epoch 0 is
    PRODUCED — a deterministic in-process stand-in for an external kill."""

    solver = None
    at = 5

    def epoch_iter(self, epoch):
        for i, b in enumerate(super().epoch_iter(epoch)):
            if epoch == 0 and i == self.at and self.solver is not None:
                self.solver._sigterm = True
            yield b


class TestInProcessSigterm:
    def test_interrupt_resume_bitwise_equals_uninterrupted(self, tmp_path):
        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)

        # uninterrupted reference run
        ref_state = Solver(_cfg(str(tmp_path / "ref"))).fit(
            MemoryIter(images, labels, 32, seed=0), None)

        # interrupted run: SIGTERM flag raised mid-epoch-0 -> SystemExit 143
        # after a mid-epoch save
        cfg = _cfg(str(tmp_path / "killed"))
        solver = Solver(cfg)
        it = _InterruptingIter(images, labels, 32, seed=0)
        it.solver = solver
        with pytest.raises(SystemExit) as exc:
            solver.fit(it, None)
        assert exc.value.code == 143
        # the mid-epoch checkpoint landed under step 0 (0 completed epochs)
        assert ckpt.latest_epoch(cfg.train.model_prefix) == 0

        # resumed run: picks up the mid-epoch checkpoint, replays the
        # exact remaining stream
        cfg2 = _cfg(str(tmp_path / "killed"))
        cfg2.train.auto_resume = True
        solver2 = Solver(cfg2)
        res_state = solver2.fit(MemoryIter(images, labels, 32, seed=0), None)

        assert int(res_state.step) == int(ref_state.step)
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(res_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ref_state.batch_stats),
                        jax.tree.leaves(res_state.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ref_state.opt_state),
                        jax.tree.leaves(res_state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("warmup", [10, 3],
                             ids=["kill_in_warmup", "kill_after_switch"])
    def test_bn_ema_program_switch_survives_resume(self, tmp_path, warmup):
        """The shipped bn-ema mode is a host-side two-program schedule
        (batch-stats warmup -> running-stats switch at step
        ``bn_ema_warmup``); the active program is a pure function of
        (config, state.step), so a kill/resume landing on EITHER side of
        the switch must be bitwise-equal to an uninterrupted run."""

        def cfg_ema(prefix):
            cfg = _cfg(str(tmp_path / prefix))
            cfg.train.bn_ema = True
            cfg.train.bn_ema_warmup = warmup   # kill lands at batch 5
            return cfg

        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)
        ref_state = Solver(cfg_ema("ref")).fit(
            MemoryIter(images, labels, 32, seed=0), None)

        cfg = cfg_ema("killed")
        solver = Solver(cfg)
        it = _InterruptingIter(images, labels, 32, seed=0)
        it.solver = solver
        with pytest.raises(SystemExit):
            solver.fit(it, None)

        cfg2 = cfg_ema("killed")
        cfg2.train.auto_resume = True
        solver2 = Solver(cfg2)
        res_state = solver2.fit(MemoryIter(images, labels, 32, seed=0), None)

        # both runs ended in the ema program (16 steps > either warmup)
        assert res_state.apply_fn is solver2._bn_ema_apply
        assert int(res_state.step) == int(ref_state.step)
        for tree in ("params", "batch_stats"):
            for a, b in zip(jax.tree.leaves(getattr(ref_state, tree)),
                            jax.tree.leaves(getattr(res_state, tree))):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_frequent_saves_midepoch(self, tmp_path):
        cfg = _cfg(str(tmp_path / "freq"), num_epochs=1)
        cfg.train.checkpoint_frequent = 3
        solver = Solver(cfg)
        images, labels = synthetic_cifar(256, 10, (16, 16, 3), seed=0)
        solver.fit(MemoryIter(images, labels, 32, seed=0), None)
        # epoch-end save is step 1; the batch-3 and batch-6 saves landed
        # (and overwrote each other) under step 0 with the data cursor
        assert ckpt.latest_epoch(cfg.train.model_prefix) == 1
        from resnet_tpu.train.state import create_train_state
        state = create_train_state(cfg)
        _, iter_state = ckpt.load_checkpoint(cfg.train.model_prefix, 0, state)
        assert iter_state["epoch"] == 0
        assert iter_state["batch"] == 6   # last multiple of 3 within 8


_DRIVER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from train_resnet import main
main(sys.argv[1:])
"""


class TestSubprocessSigterm:
    """The production-path proof: real process, real SIGTERM, real relaunch
    (the reference's recovery story is manual restart-from-epoch —
    SURVEY.md §5 failure recovery; this is strictly stronger)."""

    def _run(self, script, prefix, extra, env, wait_for_save=False):
        args = [sys.executable, str(script),
                "--preset", "cifar10_resnet18", "--depth", "20",
                "--image-shape", "16,16,3", "--num-examples", "1024",
                "--batch-size", "32", "--num-epochs", "2",
                "--pipeline", "memory", "--frequent", "4",
                "--checkpoint-frequent", "3", "--lr", "0.05",
                "--model-prefix", prefix] + extra
        p = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        if not wait_for_save:
            out, _ = p.communicate(timeout=600)
            return p.returncode, out
        # poll the run log for the first mid-epoch save, then SIGTERM.
        # stdout must be DRAINED while polling: XLA warning floods (e.g.
        # cpu_aot_loader machine-feature mismatches after a host
        # migration) can exceed the 64KB pipe buffer and block the
        # trainer mid-write before it ever reaches a save.
        import threading
        chunks = []
        drain = threading.Thread(target=lambda: chunks.append(
            p.stdout.read()), daemon=True)
        drain.start()
        log = prefix + ".log"
        deadline = time.time() + 300
        saved = False
        while time.time() < deadline and p.poll() is None:
            if os.path.exists(log) and \
                    "Saved mid-epoch checkpoint" in open(log).read():
                saved = True
                break
            time.sleep(0.2)
        assert saved, "no mid-epoch checkpoint before timeout/exit"
        p.send_signal(signal.SIGTERM)
        p.wait(timeout=120)
        drain.join(timeout=30)
        return p.returncode, "".join(chunks)

    def test_kill_resume_end_to_end(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = tmp_path / "driver.py"
        script.write_text(_DRIVER)
        env = dict(os.environ)
        env["REPO_ROOT"] = repo
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)

        ref_prefix = str(tmp_path / "ref" / "ck")
        rc, out = self._run(script, ref_prefix, [], env)
        assert rc == 0, out[-2000:]

        kill_prefix = str(tmp_path / "kill" / "ck")
        rc, out = self._run(script, kill_prefix, [], env,
                            wait_for_save=True)
        assert rc == 143, (rc, out[-2000:])
        rc, out = self._run(script, kill_prefix, ["--auto-resume"], env)
        assert rc == 0, out[-2000:]

        # final checkpoints (step 2 = both epochs done) must be bitwise equal
        from resnet_tpu.train.state import create_train_state
        cfg = _cfg(ref_prefix)
        cfg.data.num_examples = 1024
        a, _ = ckpt.load_checkpoint(ref_prefix, 2, create_train_state(cfg))
        b, _ = ckpt.load_checkpoint(kill_prefix, 2, create_train_state(cfg))
        assert int(a.step) == int(b.step) == 64   # 2 epochs x 32 batches
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a.opt_state),
                        jax.tree.leaves(b.opt_state)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
