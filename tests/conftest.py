"""Test harness: force CPU with 8 virtual devices.

The CPU-with-fake-devices setup is the TPU-world analog of the reference's
"distributed test without a cluster" trick (mxnet tests/nightly run ps-lite
scheduler+workers as local processes — SURVEY.md §4): psum/sharding logic is
exercised on 8 XLA host devices, no pod required.

Must run before jax initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize on this box overrides jax_platforms
# programmatically after env parsing — force it back before any backend
# initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Whole FILES in the conv-heavy / multi-process / e2e tier: everything in
# them is implicitly `integration`; the rest of the suite is the `fast`
# unit tier (`pytest -m fast`, target <5 min on this 1-core box).
_INTEGRATION_FILES = {
    "test_convergence_record.py",
    "test_midepoch_resume.py",
    "test_launch_recovery.py",
    "test_golden_imagenet_path.py",
    "test_dist.py",
    "test_multistep.py",
    "test_solver.py",
    "test_train.py",
    "test_graft_entry.py",
    "test_fused_chain.py",
    "test_fused_unit.py",
    "test_chain_model.py",
    "test_xla_opts.py",
    "test_remat_policy.py",
    "test_input_overhead.py",
}


def pytest_collection_modifyitems(items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        if fname in _INTEGRATION_FILES or \
                item.get_closest_marker("integration"):
            item.add_marker(pytest.mark.integration)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
