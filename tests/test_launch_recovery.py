"""Multi-host failure recovery, end to end (SURVEY.md §5).

Composes the whole distributed stack: tools/launch.py spawns 4 local
processes -> jax.distributed rendezvous -> GSPMD training over the
4-process mesh with num_parts input sharding -> collective
--checkpoint-frequent orbax saves. One worker is SIGKILLed mid-run; the
launcher's failure detection terminates the job (the reference's
dist_sync barrier would hang forever); a relaunch with --auto-resume
restores the last collective checkpoint + data cursor and the final
result is bitwise-identical to an uninterrupted run.
"""

import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from resnet_tpu.train import checkpoint as ckpt

_DRIVER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from train_resnet import main
main(sys.argv[1:])
"""

_FLAGS = ["--preset", "cifar10_resnet18", "--depth", "8",
          "--image-shape", "16,16,3", "--num-examples", "512",
          "--batch-size", "32", "--num-epochs", "2", "--pipeline", "memory",
          "--frequent", "4", "--checkpoint-frequent", "4", "--lr", "0.02"]


def _launch(tmp_path, prefix, extra, port, background=False):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "driver.py"
    if not script.exists():
        script.write_text(_DRIVER)
    env = dict(os.environ)
    env["REPO_ROOT"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)   # one CPU device per process
    args = [sys.executable, os.path.join(repo, "tools", "launch.py"),
            "-n", "4", "--local", "--coordinator", f"127.0.0.1:{port}",
            "--", sys.executable, str(script)] + _FLAGS + \
        ["--model-prefix", prefix] + extra
    p = subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    if background:
        return p
    out, _ = p.communicate(timeout=900)
    return p.returncode, out


def _launch_ok(tmp_path, prefix, extra, port, attempts=3):
    """Launch to completion, retrying coordination-service startup flakes.

    On this 1-core box a worker can miss the jax.distributed heartbeat
    while its siblings compile, killing the job with 'Socket closed'
    grpc errors unrelated to the property under test (the launches here
    are preconditions / idempotent --auto-resume legs; the bitwise
    asserts still gate correctness). Each retry uses a fresh port to
    dodge TIME_WAIT. A real failure fails all attempts."""
    for i in range(attempts):
        rc, out = _launch(tmp_path, prefix, extra, port + 100 * i)
        if rc == 0:
            return rc, out
    return rc, out


@pytest.mark.integration
def test_bn_ema_warmup_switch_multiprocess_resume(tmp_path):
    """bn-ema warmup->ema switch under multi-process kill/relaunch
    (VERDICT r3 #6): the switch is host-side state (solver._host_step), so
    a mid-epoch restore landing INSIDE the warmup phase must replay the
    program switch at the identical step on every rank — divergence would
    show up as non-bitwise final state (ranks psum-mixing different
    programs) or a crash.

    Schedule: 32 total steps (2 epochs x 16), --bn-ema-warmup 20 puts the
    switch mid-epoch-1; the kill lands after the first mid-epoch
    checkpoint (step ~4, warmup phase), so the relaunch resumes at a
    warmup-phase step and must re-arm + re-fire the switch at step 20.
    """
    ema = ["--bn-ema", "--bn-ema-warmup", "20"]
    ref_prefix = str(tmp_path / "eref" / "ck")
    rc, out = _launch_ok(tmp_path, ref_prefix, ema, 23797)
    assert rc == 0, out[-3000:]
    ref_log = open(ref_prefix + ".log").read()
    assert "bn-ema: warmup done at step 20" in ref_log

    prefix = str(tmp_path / "ekill" / "ck")
    p = _launch(tmp_path, prefix, ema, 23799, background=True)
    log = prefix + ".log"
    deadline = time.time() + 600
    while time.time() < deadline and p.poll() is None:
        if os.path.exists(log) and \
                "Saved mid-epoch checkpoint" in open(log).read():
            break
        time.sleep(0.3)
    assert p.poll() is None, p.communicate()[0][-3000:]
    # the kill must land in the WARMUP phase (before step 20) for the
    # resume to exercise the re-arm path
    assert "warmup done" not in open(log).read()
    out = subprocess.run(
        ["ps", "--ppid", str(p.pid), "-o", "pid="],
        capture_output=True, text=True).stdout.split()
    assert out, "no workers found"
    os.kill(int(out[-1]), signal.SIGKILL)
    p.communicate(timeout=300)
    assert p.returncode != 0

    rc, out2 = _launch_ok(tmp_path, prefix, ema + ["--auto-resume"], 23801)
    assert rc == 0, out2[-3000:]
    resumed_log = open(log).read()
    # the resumed run re-fired the switch at the same step
    assert "bn-ema: warmup done at step 20" in resumed_log

    from resnet_tpu.config import build_parser, config_from_args
    cfg = config_from_args(build_parser().parse_args(
        _FLAGS + ema + ["--model-prefix", ref_prefix]))
    from resnet_tpu.train.state import create_train_state
    template = create_train_state(cfg)
    a, _ = ckpt.load_checkpoint(ref_prefix, 2, template)
    b, _ = ckpt.load_checkpoint(prefix, 2, template)
    assert int(a.step) == int(b.step) == 32
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.batch_stats),
                    jax.tree.leaves(b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state),
                    jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.integration
def test_kill_one_worker_resume_bitwise(tmp_path):
    # reference run, uninterrupted
    rc, out = _launch_ok(tmp_path, str(tmp_path / "ref" / "ck"), [], 23791)
    assert rc == 0, out[-3000:]

    # killed run: SIGKILL ONE worker once the first collective mid-epoch
    # checkpoint exists; the launcher must detect the death and terminate
    # the job (no hung barrier)
    prefix = str(tmp_path / "kill" / "ck")
    p = _launch(tmp_path, prefix, [], 23793, background=True)
    log = prefix + ".log"
    deadline = time.time() + 600
    while time.time() < deadline and p.poll() is None:
        if os.path.exists(log) and \
                "Saved mid-epoch checkpoint" in open(log).read():
            break
        time.sleep(0.3)
    assert p.poll() is None, p.communicate()[0][-3000:]
    # find a worker: children of the launcher running driver.py
    out = subprocess.run(
        ["ps", "--ppid", str(p.pid), "-o", "pid="],
        capture_output=True, text=True).stdout.split()
    assert out, "no workers found"
    os.kill(int(out[-1]), signal.SIGKILL)   # kill the last-rank worker
    out_text, _ = p.communicate(timeout=300)
    assert p.returncode != 0   # job failed fast, not hung

    # relaunch with --auto-resume: restores the last collective checkpoint
    rc, out2 = _launch_ok(tmp_path, prefix, ["--auto-resume"], 23795)
    assert rc == 0, out2[-3000:]

    # final checkpoints bitwise-identical to the uninterrupted run
    from resnet_tpu.config import config_from_args, build_parser
    cfg = config_from_args(build_parser().parse_args(
        _FLAGS + ["--model-prefix", str(tmp_path / "ref" / "ck")]))
    from resnet_tpu.train.state import create_train_state
    template = create_train_state(cfg)
    a, _ = ckpt.load_checkpoint(str(tmp_path / "ref" / "ck"), 2, template)
    b, _ = ckpt.load_checkpoint(prefix, 2, template)
    assert int(a.step) == int(b.step) == 32   # 2 epochs x 16 batches
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.opt_state),
                    jax.tree.leaves(b.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
