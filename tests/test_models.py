"""Model zoo tests: shapes, param counts vs the reference depth tables.

Mirrors the role of mxnet tests/python/unittest/test_operator.py +
the §2a depth/filter tables in SURVEY.md: exact parameter-count parity with
the canonical ResNet/ResNeXt definitions is the strongest cheap signal that
the graph builder matches the reference's symbol/ builders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import Config, cifar10_resnet18, imagenet_resnext50
from resnet_tpu.models import get_model, model_spec


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


def init_model(cfg, hw=None):
    model = get_model(cfg)
    h, w, c = cfg.data.image_shape if hw is None else hw
    x = jnp.zeros((2, h, w, c), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables, x


@pytest.mark.parametrize("depth,expected", [
    # Bottleneck depths: identical to the canonical counts (He et al. /
    # torchvision) because every stage's first unit projects in both
    # conventions.
    (50, 25_557_032),
    (101, 44_549_160),
    (152, 60_192_808),
])
def test_imagenet_param_counts_bottleneck(depth, expected):
    cfg = Config()
    cfg.model.depth = depth
    model, variables, x = init_model(cfg)
    assert n_params(variables["params"]) == expected


def test_imagenet_resnet18_param_count():
    # Canonical 11,689,512 + the reference's always-project first unit of
    # stage 1 (ref:symbol/resnet.py dim_match=False): 64*64 conv + BN(64)
    # = +4,224.
    cfg = Config()
    cfg.model.depth = 18
    model, variables, x = init_model(cfg)
    assert n_params(variables["params"]) == 11_689_512 + 64 * 64 + 128


def test_resnext50_param_count():
    cfg = imagenet_resnext50()
    model, variables, x = init_model(cfg)
    # ResNeXt-50 32x4d canonical count (Xie et al. / torchvision).
    assert n_params(variables["params"]) == 25_028_904


@pytest.mark.parametrize("depth", [18, 34, 50, 101, 152])
@pytest.mark.parametrize("version", [1, 2])
def test_forward_shapes_imagenet(depth, version):
    cfg = Config()
    cfg.model.depth = depth
    cfg.model.version = version
    model, variables, x = init_model(cfg, hw=(64, 64, 3))  # small spatial
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 1000)
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize("depth", [18, 20, 56, 110, 164])
def test_forward_shapes_cifar(depth):
    cfg = cifar10_resnet18()
    cfg.model.depth = depth
    model, variables, x = init_model(cfg)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 10)


def test_cifar_spatial_resolution():
    # CIFAR stem must NOT downsample: 32x32 -> stages at 32/16/8 (6n+2)
    cfg = cifar10_resnet18()
    cfg.model.depth = 20
    units, filters, bottleneck, cifar = model_spec(cfg.model, 10)
    assert cifar and not bottleneck and units == (3, 3, 3)


def test_train_mode_updates_batch_stats():
    cfg = cifar10_resnet18()
    model, variables, x = init_model(cfg)
    logits, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_fp32_params():
    cfg = Config()
    cfg.model.depth = 50
    cfg.train.dtype = "bfloat16"
    model, variables, x = init_model(cfg, hw=(32, 32, 3))
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    logits = model.apply(variables, x, train=False)
    assert logits.dtype == jnp.float32  # head forced to fp32


def test_resnext_grouped_conv_shapes():
    cfg = imagenet_resnext50()
    model, variables, x = init_model(cfg, hw=(32, 32, 3))
    k = variables["params"]["stage1_unit1"]["conv2"]["kernel"]
    # 3x3 group conv: (3, 3, mid/groups, mid); mid=128, groups=32
    assert k.shape == (3, 3, 128 // 32, 128)


def test_v2_has_preact_structure():
    cfg = Config()
    cfg.model.depth = 50
    cfg.model.version = 2
    model, variables, x = init_model(cfg, hw=(32, 32, 3))
    params = variables["params"]
    assert "bn_data" in params and "bn_final" in params
    # fixed-gamma data BN (ref: fix_gamma=True): bias only, no scale
    assert "scale" not in params["bn_data"]


def test_remat_same_params_and_output():
    cfg = cifar10_resnet18()
    model, variables, x = init_model(cfg)
    cfg2 = cifar10_resnet18()
    cfg2.train.remat = True
    model2 = get_model(cfg2)
    out1 = model.apply(variables, x, train=False)
    out2 = model2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_conv1x1_as_dot_equivalent():
    """The dot lowering of 1x1 convs must be tree- and numerics-equivalent
    to nn.Conv (same checkpoints, same math)."""
    import dataclasses
    cfg = Config()
    cfg.model.depth = 50
    cfg.data.num_classes = 10
    model, variables, x = init_model(cfg, hw=(32, 32, 3))
    dot_model = dataclasses.replace(model, conv1x1_as_dot=True)
    v2 = dot_model.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    a = model.apply(variables, x, train=False)
    b = dot_model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=2e-3)


def test_unsupported_depth_raises():
    cfg = Config()
    cfg.model.depth = 77
    with pytest.raises(ValueError):
        model_spec(cfg.model, 1000)
