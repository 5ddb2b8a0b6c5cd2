"""Per-program XLA compiler options (the TPU fusion-budget tuning channel).

``LIBTPU_INIT_ARGS`` is NOT a usable channel on this backend (flags
partially ignored by the remote compile service — PERF_NOTES.md); per-jit
``compiler_options`` is, so every entry point routes through here.

Measured caution (PERF_NOTES.md round-2 table): raising
``xla_tpu_scoped_vmem_limit_kib`` (64/96 MB of the v5e's 128 MB VMEM)
IMPROVES the cost model (80.5 -> 73.8/71.4 GB bytes-accessed on the
R50-bs256-bf16 train step) but REGRESSES measured throughput 4-6% — the
deeper fusions schedule worse than the default 16 MB budget's pipeline.
The cost model is a screening tool, not a verdict; TPU_DEFAULTS therefore
stays empty until a knob wins on the clock.
"""

from __future__ import annotations

from typing import Dict, Optional

# No default overrides: every candidate measured so far loses on the clock
# (see module docstring). --xla-opts remains the experiment channel.
TPU_DEFAULTS: Dict[str, str] = {}


def parse_opts(spec: str) -> Dict[str, str]:
    """Parse a comma-separated ``k=v[,k=v...]`` option string."""
    opts: Dict[str, str] = {}
    for kv in filter(None, (spec or "").split(",")):
        k, _, v = kv.partition("=")
        opts[k.strip()] = v.strip()
    return opts


def compiler_options(spec: Optional[str] = None,
                     backend: Optional[str] = None) -> Optional[Dict[str, str]]:
    """Resolve the compiler options for the current backend.

    ``spec`` (the ``--xla-opts`` flag) overrides/extends the TPU defaults;
    ``spec="off"`` disables them. Non-TPU backends get only the explicit
    ``spec`` (the TPU flags are rejected by the CPU compiler).
    """
    if spec == "off":
        return None
    if backend is None:
        import jax
        backend = jax.default_backend()
    opts: Dict[str, str] = {}
    if backend == "tpu":
        opts.update(TPU_DEFAULTS)
    opts.update(parse_opts(spec or ""))
    return opts or None
