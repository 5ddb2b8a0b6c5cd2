"""Persistent XLA compilation cache setup.

Honest scope (measured, CLAUDE.md / PERF_NOTES.md): on the axon-relay
backend the persistent cache NEVER captures TPU executables — only
CPU-side jits land in the cache dir — so remote train-step compiles
(4-15+ min) are paid every process regardless. The helper still pays for
itself on CPU runs (tests, tools) and on standard TPU hosts where the
PJRT cache works. The JAX_COMPILATION_CACHE_DIR env var is NOT honored
reliably under the axon sitecustomize (verified: bench.py set only the
env var and ~/.jax_cache was never created), so entrypoints call
:func:`enable_compile_cache` after importing jax — the programmatic
config always works.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str = "") -> str:
    """Point JAX's persistent compilation cache at ``path`` (default
    ~/.jax_cache or $JAX_COMPILATION_CACHE_DIR). Idempotent."""
    import jax

    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: a relay round-trip is never free
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
