"""Per-program XLA compiler options (the TPU fusion-budget tuning channel).

The one knob measured to matter on this model is the scoped-VMEM budget:
XLA:TPU's fusion sizing defaults to a conservative ~16 MB of scoped VMEM
per fusion, which splits the ResNet BN-stats/normalize/conv chains into
separate HBM sweeps. Raising it to 96 MB (of the v5e's 128 MB VMEM) lets
the fusion cost model keep those chains resident: XLA cost analysis drops
from 80.5 GB to 71.4 GB bytes-accessed on the R50-bs256-bf16 train step,
and measured step time follows (PERF_NOTES.md round-2 table).

``LIBTPU_INIT_ARGS`` is NOT a usable channel on this backend (flags
partially ignored by the remote compile service — PERF_NOTES.md); per-jit
``compiler_options`` is, so every entry point routes through here.
"""

from __future__ import annotations

from typing import Dict, Optional

# Measured on v5e (tools/cost_probe.py + bench.py, see PERF_NOTES.md).
TPU_DEFAULTS = {
    "xla_tpu_scoped_vmem_limit_kib": "98304",
}


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
