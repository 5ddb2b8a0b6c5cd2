"""Model-level parity of the chain-unit execution path (models/chain.py).

The chain is a pure execution-path switch: same param/variable tree, same
math as the standard nn.Conv/nn.BatchNorm v1 bottleneck units (which
themselves rebuild ref:symbol/resnet.py residual_unit). These tests apply
BOTH paths to the SAME initialized variables and assert logits, updated
batch_stats and parameter gradients agree, for the XLA backend and the
Pallas backend in interpret mode (the repo's kernel test convention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.models.resnet import ResNet
from resnet_tpu.ops.metrics import cross_entropy_loss


def _tiny_bottleneck(unit_chain="off", interpret=False):
    # 2 stages x 2 units: covers projection (strided + unstrided) and
    # identity shortcuts; bottleneck v1 = the chain-eligible shape.
    return ResNet(units=(2, 2), filters=(8, 16, 32), num_classes=10,
                  bottleneck=True, version=1, cifar_stem=True,
                  unit_chain=unit_chain, pallas_interpret=interpret)


def _tree_allclose(a, b, rtol, atol, prefix=""):
    ka, kb = set(a.keys()), set(b.keys())
    assert ka == kb, f"{prefix}: key mismatch {ka ^ kb}"
    for k in ka:
        if isinstance(a[k], dict):
            _tree_allclose(a[k], b[k], rtol, atol, f"{prefix}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                rtol=rtol, atol=atol, err_msg=f"{prefix}/{k}")


class TestChainUnitParity:
    def setup_method(self, _):
        rng = jax.random.key(0)
        self.x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3),
                                   jnp.float32)
        self.labels = jnp.array([0, 3, 7, 9], jnp.int32)
        self.variables = _tiny_bottleneck().init(rng, self.x, train=False)

    def _run(self, model):
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params,
                 "batch_stats": self.variables["batch_stats"]},
                self.x, train=True, mutable=["batch_stats"])
            return (cross_entropy_loss(logits, self.labels),
                    (logits, mutated["batch_stats"]))

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(self.variables["params"])
        return loss, logits, stats, grads

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_train_parity(self, backend):
        ref = self._run(_tiny_bottleneck("off"))
        got = self._run(_tiny_bottleneck(backend, interpret=True))
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-4, atol=1e-5)
        _tree_allclose(got[2], ref[2], 1e-4, 1e-6, "batch_stats")
        _tree_allclose(got[3], ref[3], 1e-3, 1e-5, "grads")

    def test_param_tree_identical(self):
        # chain models must init to the identical variable tree (the flag
        # is execution-only; checkpoints interchange)
        v_chain = _tiny_bottleneck("xla").init(
            jax.random.key(0), self.x, train=False)
        assert jax.tree.structure(v_chain) == jax.tree.structure(
            self.variables)
        _tree_allclose(v_chain["params"], self.variables["params"],
                       0, 0, "params")

    def test_eval_path_unchanged(self):
        # eval must bypass the chain entirely (bitwise-identical logits)
        ref = _tiny_bottleneck("off").apply(self.variables, self.x,
                                            train=False)
        got = _tiny_bottleneck("xla").apply(self.variables, self.x,
                                            train=False)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_train_step_with_chain(self):
        # full jitted train step (optimizer + metrics) runs with the chain
        from resnet_tpu.config import Config
        from resnet_tpu.train.state import create_train_state
        from resnet_tpu.train.steps import make_train_step

        cfg = Config()
        cfg.model.depth = 50
        cfg.data.image_shape = (32, 32, 3)
        cfg.data.num_classes = 10
        cfg.train.batch_size = 4
        cfg.train.unit_chain = "xla"
        state = create_train_state(cfg)
        step = make_train_step(mesh=None)
        batch = {"image": jnp.zeros((4, 32, 32, 3), jnp.float32),
                 "label": jnp.zeros((4,), jnp.int32)}
        state2, metrics = step(state, batch)
        assert float(metrics["count"]) == 4
        assert np.isfinite(float(metrics["loss_sum"]))
