"""Chain-op (fused_unit) parity tests: forward + custom VJP vs jax.grad of
the XLA reference, in f64 via Pallas interpret mode (the repo's kernel
test convention — every Pallas op gets a NumPy/f64 oracle + interpret-mode
parity test vs the XLA path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.ops import fused_unit as fu


@pytest.fixture(autouse=True)
def _x64():
    # scoped, not module-level: a global jax_enable_x64 flip at import time
    # leaks into every other test module in the session (param dtypes)
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _rand(shape, key, dtype=jnp.float64):
    return jax.random.normal(jax.random.key(key), shape, dtype)


class TestMatmulStats:
    def test_forward_matches_reference(self):
        x = _rand((64, 16), 0)
        w = _rand((16, 32), 1)
        got = fu.matmul_stats(x, w, "pallas", True)
        want = fu.reference_matmul_stats(x, w)
        for g, r in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-12)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_vjp_matches_autodiff(self, backend):
        x = _rand((32, 8), 2)
        w = _rand((8, 16), 3)
        cots = (_rand((32, 16), 4), _rand((16,), 5), _rand((16,), 6))

        def loss_op(x, w):
            y, s, ss = fu.matmul_stats(x, w, backend, True)
            return (jnp.sum(y * cots[0]) + jnp.sum(s * cots[1])
                    + jnp.sum(ss * cots[2]))

        def loss_ref(x, w):
            y, s, ss = fu.reference_matmul_stats(x, w)
            return (jnp.sum(y * cots[0]) + jnp.sum(s * cots[1])
                    + jnp.sum(ss * cots[2]))

        gx, gw = jax.grad(loss_op, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-10)


class TestNormReluMatmulStats:
    def _inputs(self):
        x = _rand((48, 8), 10)
        w = _rand((8, 24), 11)
        mean = _rand((8,), 12) * 0.2
        var = jnp.abs(_rand((8,), 13)) + 0.5
        gamma = 1.0 + 0.1 * _rand((8,), 14)
        beta = 0.1 * _rand((8,), 15)
        return x, w, mean, var, gamma, beta

    @pytest.mark.parametrize("relu", [True, False])
    def test_forward_matches_reference(self, relu):
        args = self._inputs()
        got = fu.norm_relu_matmul_stats(*args, 2e-5, relu, "pallas", True)
        want = fu.reference_norm_relu_matmul_stats(*args, relu=relu)
        for g, r in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    @pytest.mark.parametrize("relu", [True, False])
    def test_vjp_matches_autodiff(self, backend, relu):
        args = self._inputs()
        cots = (_rand((48, 24), 20), _rand((24,), 21), _rand((24,), 22))

        def make_loss(f, *extra):
            def loss(x, w, mean, var, gamma, beta):
                y, s, ss = f(x, w, mean, var, gamma, beta, *extra)
                return (jnp.sum(y * cots[0]) + jnp.sum(s * cots[1])
                        + jnp.sum(ss * cots[2]))
            return loss

        got = jax.grad(make_loss(fu.norm_relu_matmul_stats, 2e-5, relu,
                                 backend, True),
                       argnums=tuple(range(6)))(*args)
        want = jax.grad(make_loss(
            lambda *a: fu.reference_norm_relu_matmul_stats(
                a[0], a[1], a[2], a[3], a[4], a[5], relu=relu)),
            argnums=tuple(range(6)))(*args)
        names = ["dx", "dw", "dmean", "dvar", "dgamma", "dbeta"]
        for n, g, r in zip(names, got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-8, atol=1e-10,
                err_msg=f"{n} mismatch ({backend}, relu={relu})")

    def test_bf16_pallas_close_to_f32(self):
        """Mixed-precision sanity on the CPU interpreter: bf16 inputs,
        f32 accumulation; grads within bf16 tolerance of the f32 ref."""
        jax.config.update("jax_enable_x64", False)
        try:
            x = jax.random.normal(jax.random.key(0), (32, 8), jnp.float32)
            w = jax.random.normal(jax.random.key(1), (8, 16), jnp.float32)
            mean = jnp.zeros((8,))
            var = jnp.ones((8,))
            gamma = jnp.ones((8,))
            beta = jnp.zeros((8,))

            def loss(f, x, w):
                y, s, ss = f(x, w, mean, var, gamma, beta)
                return jnp.sum(y) + jnp.sum(s * 0.01) + jnp.sum(ss * 0.001)

            op = lambda x, w: loss(
                lambda *a: fu.norm_relu_matmul_stats(*a, 2e-5, True,
                                                     "pallas", True), x, w)
            ref = lambda x, w: loss(
                lambda *a: fu.reference_norm_relu_matmul_stats(*a), x, w)
            gx, gw = jax.grad(op, (0, 1))(x.astype(jnp.bfloat16),
                                          w.astype(jnp.bfloat16))
            rx, rw = jax.grad(ref, (0, 1))(x, w)
            np.testing.assert_allclose(np.asarray(gx, np.float32),
                                       np.asarray(rx), rtol=0.05, atol=0.3)
            np.testing.assert_allclose(np.asarray(gw, np.float32),
                                       np.asarray(rw), rtol=0.05, atol=0.3)
        finally:
            jax.config.update("jax_enable_x64", True)
