"""radial_projection: the bn-ema stabilizer (train/optim.py).

Frozen-stats BN (bn_ema) drops BatchNorm's implicit backward projection of
conv-kernel gradients orthogonal to each filter; without it training
diverges (the convergence bar's pinned counter-evidence). These tests pin
the transform's algebra and its claimed relationship to batch-stats BN:
the projection is a mathematical NO-OP on gradients that flowed through a
true batch-stats BN (scale invariance => <g_c, w_c> = 0 already).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.train.optim import radial_projection


def _per_channel_dot(g, p):
    return np.einsum("hwic,hwic->c", np.asarray(g, np.float64),
                     np.asarray(p, np.float64))


class TestRadialProjection:
    def test_output_orthogonal_per_channel(self):
        k1, k2 = jax.random.split(jax.random.key(0))
        p = {"kernel": jax.random.normal(k1, (3, 3, 8, 16))}
        g = {"kernel": jax.random.normal(k2, (3, 3, 8, 16))}
        tx = radial_projection()
        out, _ = tx.update(g, tx.init(p), p)
        dots = _per_channel_dot(out["kernel"], p["kernel"])
        norms = _per_channel_dot(p["kernel"], p["kernel"])
        np.testing.assert_allclose(dots / norms, 0.0, atol=1e-6)
        # only the radial component was removed: residual equals g minus
        # its per-channel projection (f64 oracle)
        g64 = np.asarray(g["kernel"], np.float64)
        p64 = np.asarray(p["kernel"], np.float64)
        coef = _per_channel_dot(g64, p64) / norms
        np.testing.assert_allclose(
            np.asarray(out["kernel"]), g64 - p64 * coef, rtol=1e-5,
            atol=1e-6)

    def test_non_conv_params_untouched(self):
        p = {"dense": jnp.ones((4, 10)), "scale": jnp.ones((7,)),
             "bias": jnp.zeros((7,))}
        g = jax.tree.map(lambda x: x + 2.0, p)
        tx = radial_projection()
        out, _ = tx.update(g, tx.init(p), p)
        for k in p:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(g[k]))

    def test_noop_on_batch_stats_bn_gradients(self):
        """Scale invariance of conv->BN(batch stats): the true gradient is
        already orthogonal to each filter, so the projection changes
        nothing — the docstring's warmup-phase-is-a-noop claim."""

        class ConvBN(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(12, (3, 3), use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=False,
                                 momentum=0.9)(x)
                return nn.relu(x)

        m = ConvBN()
        x = jax.random.normal(jax.random.key(1), (8, 10, 10, 5))
        v = m.init(jax.random.key(2), x)
        w = jax.random.normal(jax.random.key(3), (8, 10, 10, 12))

        def loss(params):
            y, _ = m.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, x,
                           mutable=["batch_stats"])
            return jnp.sum(y * w) + jnp.sum(jnp.abs(y))

        g = jax.grad(loss)(v["params"])
        kern = v["params"]["Conv_0"]["kernel"]
        gk = g["Conv_0"]["kernel"]
        # per-channel radial component ~ 0 relative to the gradient size
        # (float32 autodiff noise floor: measured ~3e-5 on this shape)
        dots = _per_channel_dot(gk, kern)
        scale = (np.sqrt(_per_channel_dot(gk, gk))
                 * np.sqrt(_per_channel_dot(kern, kern)))
        np.testing.assert_allclose(dots / scale, 0.0, atol=2e-4)
        tx = radial_projection()
        out, _ = tx.update(g, tx.init(v["params"]), v["params"])
        # the projection may remove only that noise-floor radial component:
        # bound the CHANGE by the measured radial fraction of the gradient
        # norm (elementwise rtol is the wrong yardstick — small elements
        # shift by a share of the channel norm, not of themselves)
        delta = np.linalg.norm(np.asarray(out["Conv_0"]["kernel"], np.float64)
                               - np.asarray(gk, np.float64))
        gnorm = np.linalg.norm(np.asarray(gk, np.float64))
        assert delta < 5e-4 * gnorm, (delta, gnorm)

    def test_state_chains_projection_only_for_bn_ema(self):
        from resnet_tpu.config import Config
        from resnet_tpu.train.state import create_train_state

        cfg = Config()
        cfg.model.depth = 18
        cfg.model.dataset = "cifar10"
        cfg.model.depth = 20
        cfg.data.num_classes = 10
        cfg.data.image_shape = (16, 16, 3)
        base = create_train_state(cfg)
        assert isinstance(base.opt_state, tuple) and \
            hasattr(base.opt_state, "momentum")   # bare MXNetSGDState
        cfg.train.bn_ema = True
        ema = create_train_state(cfg)
        # chained: (EmptyState, MXNetSGDState)
        assert isinstance(ema.opt_state, tuple) and \
            not hasattr(ema.opt_state, "momentum")
        assert hasattr(ema.opt_state[1], "momentum")
        cfg.train.bn_ema_project = False
        off = create_train_state(cfg)
        assert hasattr(off.opt_state, "momentum")

    def test_first_order_norm_invariance(self):
        """The mechanism: a projected update changes each filter's norm
        only at second order in lr (d||w||^2 = -2*lr*<g,w> + lr^2*||g||^2,
        and the projection zeroes the first-order term), so the frozen
        normalizer's radial runaway channel is closed — norm drift is
        driven by lr^2 accumulation + weight decay, exactly as with
        batch-stats BN."""
        k1, k2 = jax.random.split(jax.random.key(7))
        p = {"kernel": jax.random.normal(k1, (3, 3, 8, 16))}
        g = {"kernel": jax.random.normal(k2, (3, 3, 8, 16))}
        tx = radial_projection()
        gp, _ = tx.update(g, tx.init(p), p)
        lr = 1e-2
        w = np.asarray(p["kernel"], np.float64)

        def first_order_drift(u):
            u = np.asarray(u, np.float64)
            wn = _per_channel_dot(w, w)
            stepped = _per_channel_dot(w - lr * u, w - lr * u)
            # subtract the unavoidable second-order term
            return np.abs(stepped - wn - lr * lr * _per_channel_dot(u, u))

        raw = first_order_drift(g["kernel"])       # = 2*lr*|<g,w>| per ch
        proj = first_order_drift(gp["kernel"])     # ~ 0 (f32 residual)
        assert proj.max() < 1e-3 * raw.mean(), (proj.max(), raw.mean())
