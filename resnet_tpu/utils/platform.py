"""Platform selection helper for CLI entrypoints.

The axon sitecustomize on TPU boxes re-forces ``jax_platforms`` to the TPU
relay AFTER env parsing, so ``JAX_PLATFORMS=cpu python <tool>`` would
silently run on the remote chip (and sit in a multi-minute remote compile).
Every CLI entrypoint calls this right after importing jax so an explicit
env request wins (CLAUDE.md environment gotchas; the tests' conftest does
the same for pytest).
"""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Make an explicit JAX_PLATFORMS env request actually win."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
