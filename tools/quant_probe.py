#!/usr/bin/env python
"""Microbenchmark: int8 vs bf16 MXU throughput on ResNet-50 serving shapes.

Question probed: would an int8 post-training-quantized serving path (the
TPU-native analog of the int8 deploy flows MXNet-era stacks bolted on via
TensorRT/MKLDNN — nothing in the reference repo itself ships one, see
SURVEY.md §2 non-goals) beat the bf16 serving artifact's 13,370 img/s?
The v5e MXU's int8 peak is ~2x its bf16 peak, so the ceiling argument
says yes; this probe asks whether the R50 shapes ever SEE that ceiling.

MEASURED OUTCOME (2026-08-20, v5e via axon; PERF_NOTES.md round 5):
no. The serving-forward conv shapes run at 8-28 TFLOP/s in bf16 — they
are HBM-bound, not MXU-bound — so int8's win is halved bytes, not
doubled FLOPs:

    dot   25088x1024x256 (mid-stage 1x1): bf16 1.543 ms -> int8 1.191 ms (1.30x)
    conv  3x3 128x14x14x256            : bf16 1.226 ms -> int8 1.037 ms (1.18x)
    dot   401408x64x256  (early 1x1)   : bf16 1.588 ms -> int8 1.552 ms (1.02x)

A whole-model int8 path would additionally pay per-conv
quantize/requantize sweeps (an extra elementwise read+write of every
activation — exactly the boundary traffic the round-4 fusions existed
to delete) and carry calibration + accuracy-drift machinery. Projected
end-to-end gain: <10% before requantize costs, plausibly negative
after. DECISION: not built; the bf16 serving artifact stays the
shipped path. Kept as the harness for retrying on MXU-bound models or
future chips where the fwd shapes clear the bandwidth roof.

    python tools/quant_probe.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes for CPU smoke-testing the harness")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def clock(fn, fargs):
        out = fn(*fargs)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        rates = []
        for _w in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*fargs)
            _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
            rates.append((time.perf_counter() - t0) / args.iters)
        rates.sort()
        return rates[len(rates) // 2]

    dot_i8 = jax.jit(lambda x, y: lax.dot(
        x, y, preferred_element_type=jnp.int32))
    dot_bf = jax.jit(lambda x, y: lax.dot(
        x, y, preferred_element_type=jnp.float32))

    def dot_case(M, K, N, label):
        a8 = jax.device_put(rng.integers(-127, 127, (M, K), dtype=np.int8))
        b8 = jax.device_put(rng.integers(-127, 127, (K, N), dtype=np.int8))
        abf = jax.device_put(rng.standard_normal(
            (M, K), dtype=np.float32).astype(jnp.bfloat16))
        bbf = jax.device_put(rng.standard_normal(
            (K, N), dtype=np.float32).astype(jnp.bfloat16))
        t_bf, t_i8 = clock(dot_bf, (abf, bbf)), clock(dot_i8, (a8, b8))
        fl = 2 * M * K * N
        print(f"dot {M}x{K}x{N} ({label}): "
              f"bf16 {t_bf*1e3:.3f} ms ({fl/t_bf/1e12:.1f} T), "
              f"int8 {t_i8*1e3:.3f} ms ({fl/t_i8/1e12:.1f} T), "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)

    def conv_case(Nb, H, W, C, label):
        x8 = jax.device_put(rng.integers(
            -127, 127, (Nb, H, W, C), dtype=np.int8))
        k8 = jax.device_put(rng.integers(
            -127, 127, (3, 3, C, C), dtype=np.int8))
        xbf = jax.device_put(rng.standard_normal(
            (Nb, H, W, C), dtype=np.float32).astype(jnp.bfloat16))
        kbf = jax.device_put(rng.standard_normal(
            (3, 3, C, C), dtype=np.float32).astype(jnp.bfloat16))
        dn = lax.conv_dimension_numbers(
            (Nb, H, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"))
        conv_i8 = jax.jit(lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32))
        conv_bf = jax.jit(lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32))
        t_bf, t_i8 = clock(conv_bf, (xbf, kbf)), clock(conv_i8, (x8, k8))
        fl = 2 * Nb * H * W * C * C * 9
        print(f"conv3x3 {Nb}x{H}x{W}x{C} ({label}): "
              f"bf16 {t_bf*1e3:.3f} ms ({fl/t_bf/1e12:.1f} T), "
              f"int8 {t_i8*1e3:.3f} ms ({fl/t_i8/1e12:.1f} T), "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)

    if args.quick:
        dot_case(256, 64, 64, "quick")
        conv_case(2, 8, 8, 32, "quick")
        return

    # bs128 serving-forward representatives (see docstring for results)
    dot_case(128 * 14 * 14, 1024, 256, "mid-stage 1x1")
    conv_case(128, 14, 14, 256, "stage-3 3x3")
    dot_case(128 * 56 * 56, 64, 256, "early 1x1")


if __name__ == "__main__":
    main()
