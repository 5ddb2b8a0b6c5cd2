#!/usr/bin/env python
"""Microbenchmark: BN-backward sum-pair (S1=sum(gy), S2=sum(gy*xhat))
as XLA reduces vs a streaming Pallas kernel, on ResNet-50's (M, C)
activation shapes.

Motivation (PERF_NOTES.md round-2 trace): convert_reduce fusions cost
30.5 ms/step — these sums read gy and x once each (~13.4 ms at the
v5e's 819 GB/s), so XLA achieves ~44% of HBM peak on them. If a Pallas
streaming reduce got near peak, a custom-VJP BatchNorm backward would
close most of the 2577 -> 3000 img/s gap.

MEASURED OUTCOME (see PERF_NOTES.md "Where the remaining time goes"):
it does not. XLA reduce ~214-454 GB/s, this Pallas kernel 123-292 GB/s,
and an MXU diag-dot lowering matches XLA — the column-reduce rate is a
memory-subsystem property, not a scheduling artifact. Kept as the probe
that established that, and as the harness for retrying on future chips.
Caveat: per-dispatch relay overhead (~2 ms) and a ~1.8 ms
serialized-chain floor make the small shapes floor-bound; compare only
shapes whose ideal time clears the floor.

    python tools/reduce_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (M, C) pairs: every distinct R50 bottleneck BN-input shape at bs256
SHAPES = [
    (802816, 64),
    (802816, 256),
    (200704, 128),
    (200704, 512),
    (50176, 256),
    (50176, 1024),
    (12544, 512),
    (12544, 2048),
]


def pallas_sums(gy, x, mean, inv, bm=2048, interpret=False):
    """(S1, S2) partials via a sequential-grid streaming kernel.

    Returns (8, C) f32 partial pairs; caller sums the 8. Accumulators
    live in VMEM across the grid (TPU grids are sequential)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = gy.shape
    while m % bm:
        bm //= 2
    grid = m // bm

    def kernel(c_ref, gy_ref, x_ref, s1_ref, s2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        gy_b = gy_ref[...].astype(jnp.float32)
        xhat = (x_ref[...].astype(jnp.float32) - c_ref[0]) * c_ref[1]
        s1_ref[...] += gy_b.reshape(-1, 8, c).sum(axis=0)
        s2_ref[...] += (gy_b * xhat).reshape(-1, 8, c).sum(axis=0)

    consts = jnp.stack([mean, inv]).astype(jnp.float32)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ),
        interpret=interpret,
    )(consts, gy, x)
    return s1.sum(axis=0), s2.sum(axis=0)


def xla_sums(gy, x, mean, inv):
    import jax.numpy as jnp
    gy32 = gy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    return gy32.sum(axis=0), (gy32 * xhat).sum(axis=0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--check", action="store_true",
                   help="numeric parity only (CPU interpret mode)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        rng = np.random.default_rng(0)
        m, c = 4096, 128
        gy = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(m, c)), jnp.bfloat16)
        mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        inv = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
        s1p, s2p = pallas_sums(gy, x, mean, inv, interpret=True)
        s1x, s2x = xla_sums(gy, x, mean, inv)
        np.testing.assert_allclose(s1p, s1x, rtol=1e-5, atol=1e-2)
        np.testing.assert_allclose(s2p, s2x, rtol=1e-4, atol=1e-1)
        print("parity ok")
        return 0

    for m, c in SHAPES:
        rng = np.random.default_rng(0)
        gy = jax.device_put(jnp.asarray(
            rng.normal(size=(m, c)), jnp.bfloat16))
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(m, c)), jnp.bfloat16))
        mean = jnp.zeros((c,), jnp.float32)
        inv = jnp.ones((c,), jnp.float32)
        gb = 2 * m * c * 2 / 1e9  # both inputs, bf16

        for name, fn in (("xla", xla_sums),
                         ("pallas", functools.partial(pallas_sums))):
            # run all iters inside ONE dispatch (per-call relay overhead is
            # ~2 ms, which would swamp the kernel) with a serial dependency
            # so XLA cannot CSE or overlap the repetitions
            def many(gy, x, mean, inv, n, fn=fn):
                # static unroll: a device while-loop stalls ~2 ms/iter on
                # this backend (measured), swamping the kernel
                s1 = s2 = jnp.zeros((c,), jnp.float32)
                for _ in range(n):
                    s1, s2 = fn(gy, x, mean + s1 * 1e-30, inv)
                return s1, s2

            f = jax.jit(functools.partial(many, n=args.iters))
            s1, s2 = f(gy, x, mean, inv)
            float(s1[0])  # forced readback sync (axon quirk)
            tic = time.perf_counter()
            s1, s2 = f(gy, x, mean, inv)
            float(s1[0]), float(s2[0])
            dt = (time.perf_counter() - tic) / args.iters
            print(f"({m:7d},{c:5d}) {name:6s} {dt*1e3:7.3f} ms "
                  f"{gb/dt:6.0f} GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
