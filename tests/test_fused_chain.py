"""Chained normalize+matmul+stats kernel vs its XLA oracle (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.ops.fused_chain import (normalized_matmul_with_stats,
                                        reference_chain)


def test_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (256, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (64, 128)).astype(np.float32))
    mean = jnp.asarray(rng.normal(0, 1, (64,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2, (64,)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(1, 0.1, (64,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
    for relu in [True, False]:
        y, s, ss = normalized_matmul_with_stats(
            x, w, mean, var, gamma, beta, relu=relu, bm=64, bn=128,
            interpret=True)
        yr, sr, ssr = reference_chain(x, w, mean, var, gamma, beta,
                                      relu=relu)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(ssr),
                                   rtol=1e-4, atol=1e-3)
