"""Parity of the ResNeXt grouped-conv block-diagonal dense lowering
(models/resnet.py _GroupedConvDense) vs flax's feature_group_count conv.

The lowering is an execution-path switch only: identical `conv2/kernel`
param tree, identical math (the off-diagonal blocks are structural zeros),
full-model outputs and gradients must match the grouped path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.models.resnet import ResNet, _GroupedConvDense
import flax.linen as nn


def _resnext(grouped_dense):
    return ResNet(units=(1, 1), filters=(8, 64, 128), num_classes=10,
                  bottleneck=True, version=1, cardinality=8, group_width=4,
                  cifar_stem=True, grouped_dense=grouped_dense)


class TestGroupedDense:
    def test_op_matches_grouped_conv(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
        dense = _GroupedConvDense(features=32, kernel_size=(3, 3),
                                  strides=(1, 1), groups=8,
                                  padding=((1, 1), (1, 1)))
        ref = nn.Conv(32, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                      feature_group_count=8, use_bias=False)
        v = dense.init(jax.random.key(1), x)
        got = dense.apply(v, x)
        want = ref.apply(v, x)
        assert v["params"]["kernel"].shape == (3, 3, 4, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("merge", [1, 2, 4])
    def test_partial_merge_matches_grouped_conv(self, merge):
        """merge groups per dense block (feature_group_count = G/merge)."""
        x = jax.random.normal(jax.random.key(8), (2, 8, 8, 32))
        dense = _GroupedConvDense(features=32, kernel_size=(3, 3),
                                  strides=(1, 1), groups=8, merge=merge,
                                  padding=((1, 1), (1, 1)))
        ref = nn.Conv(32, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                      feature_group_count=8, use_bias=False)
        v = dense.init(jax.random.key(9), x)
        np.testing.assert_allclose(np.asarray(dense.apply(v, x)),
                                   np.asarray(ref.apply(v, x)),
                                   rtol=1e-5, atol=1e-5)
        gd = jax.grad(lambda p: jnp.sum(dense.apply(p, x) ** 2))(v)
        gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(v)
        np.testing.assert_allclose(np.asarray(gd["params"]["kernel"]),
                                   np.asarray(gr["params"]["kernel"]),
                                   rtol=1e-4, atol=1e-5)

    def test_strided(self):
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 16))
        dense = _GroupedConvDense(features=16, kernel_size=(3, 3),
                                  strides=(2, 2), groups=4,
                                  padding=((1, 1), (1, 1)))
        ref = nn.Conv(16, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                      feature_group_count=4, use_bias=False)
        v = dense.init(jax.random.key(3), x)
        np.testing.assert_allclose(np.asarray(dense.apply(v, x)),
                                   np.asarray(ref.apply(v, x)),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_stay_block_diagonal(self):
        # grads flow only to the real grouped parameter (same shape/tree)
        x = jax.random.normal(jax.random.key(4), (2, 4, 4, 16))
        dense = _GroupedConvDense(features=16, kernel_size=(3, 3),
                                  strides=(1, 1), groups=4,
                                  padding=((1, 1), (1, 1)))
        ref = nn.Conv(16, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                      feature_group_count=4, use_bias=False)
        v = dense.init(jax.random.key(5), x)
        gd = jax.grad(lambda p: jnp.sum(dense.apply(p, x) ** 2))(v)
        gr = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(v)
        np.testing.assert_allclose(np.asarray(gd["params"]["kernel"]),
                                   np.asarray(gr["params"]["kernel"]),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("version", [1, 2])
    def test_full_model_parity(self, version):
        x = jax.random.normal(jax.random.key(6), (2, 16, 16, 3))
        ref_model = ResNet(units=(1, 1), filters=(8, 64, 128),
                           num_classes=10, bottleneck=True, version=version,
                           cardinality=8, group_width=4, cifar_stem=True)
        gd_model = ResNet(units=(1, 1), filters=(8, 64, 128),
                          num_classes=10, bottleneck=True, version=version,
                          cardinality=8, group_width=4, cifar_stem=True,
                          grouped_dense=True)
        v = ref_model.init(jax.random.key(7), x, train=False)
        v2 = gd_model.init(jax.random.key(7), x, train=False)
        assert jax.tree.structure(v) == jax.tree.structure(v2)
        ref = ref_model.apply(v, x, train=False)
        got = gd_model.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
