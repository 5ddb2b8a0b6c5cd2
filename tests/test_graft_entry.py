"""Driver-contract tests for __graft_entry__ (cheap CPU versions)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    # abstract evaluation = "does it trace/jit" without paying CPU compile
    out = jax.eval_shape(fn, *args)
    assert out.shape == (16, 1000)


def test_dryrun_multichip_small():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_dryrun_multichip_16_devices():
    """Pin BASELINE configs[4]'s exact mesh size: both DP modes run and the
    imagenet_resnet152_dp pod preset compiles at 16 (virtual) devices.
    Subprocess because the device count is fixed at JAX init."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "__graft_entry__.py", "dryrun", "16"],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=1500)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ok (shard_map)" in out.stdout
    assert "ok (jit)" in out.stdout
    assert "pod preset imagenet_resnet152_dp" in out.stdout
