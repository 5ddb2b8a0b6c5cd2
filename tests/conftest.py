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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
