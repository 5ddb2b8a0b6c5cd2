"""Whole-model cross-framework oracle: the MXNet-named export replayed
through an INDEPENDENT PyTorch forward pass.

The per-op oracles (tests/test_augment_oracle.py etc.) pin individual
kernels against NumPy; this pins the WHOLE network — architecture wiring,
weight-layout export (HWIO->OIHW, dense transpose), BN eval semantics —
against a from-scratch torch implementation that shares no code with the
flax model: it interprets the exported ``stage{S}_unit{U}_*`` name table
(utils/export.py, ref: mx.model.save_checkpoint naming) with
torch.nn.functional ops in NCHW and float64. Agreement across two
frameworks, two layouts, and two precisions is the strongest offline
substitute for loading a real MXNet-trained checkpoint (impossible here:
no MXNet, no egress — PARITY.md gap #2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resnet_tpu.config import Config
from resnet_tpu.models import get_model, model_spec
from resnet_tpu.utils.export import export_mxnet_params


def _randomize(variables, seed=0):
    """Replace init values with random ones: catches transposed layouts
    and mean/var mix-ups that symmetric init values would mask."""
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        a = rng.normal(0, 0.5, leaf.shape)
        if keys.endswith("var"):
            a = np.abs(a) + 0.5
        elif keys.endswith("mean"):
            a = a * 0.2
        return jnp.asarray(a, leaf.dtype)

    return jax.tree_util.tree_map_with_path(rand, variables)


def _torch_forward(x_nhwc, args, auxs, cfg):
    """Independent NCHW/float64 forward from the exported name table."""
    import torch
    import torch.nn.functional as F

    m = cfg.model
    units, filters, bottleneck, cifar = model_spec(m, cfg.data.num_classes)
    cardinality = m.cardinality if m.network == "resnext" else 1
    eps = m.bn_eps

    T = lambda a: torch.from_numpy(np.asarray(a, np.float64))

    def conv(x, name, stride=1, pad=0, groups=1):
        return F.conv2d(x, T(args[name + "_weight"]), stride=stride,
                        padding=pad, groups=groups)

    def bn(x, name, scale=True):
        return F.batch_norm(
            x, T(auxs[name + "_moving_mean"]), T(auxs[name + "_moving_var"]),
            T(args[name + "_gamma"]) if scale else None,
            T(args[name + "_beta"]), training=False, eps=eps)

    x = T(x_nhwc).permute(0, 3, 1, 2)
    relu = F.relu

    if m.version == 2:
        x = bn(x, "bn_data", scale=False)
    if cifar:
        x = conv(x, "conv0", 1, 1)
        if m.version == 1:
            x = relu(bn(x, "bn0"))
    else:
        x = conv(x, "conv0", 2, 3)
        x = relu(bn(x, "bn0"))
        x = F.max_pool2d(x, 3, 2, padding=1)

    for stage, (n_units, n_filter) in enumerate(zip(units, filters[1:])):
        for unit in range(n_units):
            first = unit == 0
            s = 2 if (first and stage > 0) else 1
            p = f"stage{stage + 1}_unit{unit + 1}_"
            if bottleneck:
                if cardinality > 1:
                    mid = max(n_filter * cardinality * m.group_width // 256,
                              cardinality)
                else:
                    mid = n_filter // 4
            else:
                mid = n_filter

            if m.version == 2:
                pre = relu(bn(x, p + "bn1"))
                sc = x if not first else conv(pre, p + "sc", s)
                if bottleneck:
                    y = conv(pre, p + "conv1")
                    y = relu(bn(y, p + "bn2"))
                    y = conv(y, p + "conv2", s, 1, groups=cardinality)
                    y = relu(bn(y, p + "bn3"))
                    y = conv(y, p + "conv3")
                else:
                    y = conv(pre, p + "conv1", s, 1)
                    y = relu(bn(y, p + "bn2"))
                    y = conv(y, p + "conv2", 1, 1)
                x = y + sc
            else:
                sc = x
                if first:
                    sc = bn(conv(x, p + "sc", s), p + "sc_bn")
                if bottleneck:
                    y = conv(x, p + "conv1")
                    y = relu(bn(y, p + "bn1"))
                    y = conv(y, p + "conv2", s, 1, groups=cardinality)
                    y = relu(bn(y, p + "bn2"))
                    y = bn(conv(y, p + "conv3"), p + "bn3")
                else:
                    y = conv(x, p + "conv1", s, 1)
                    y = relu(bn(y, p + "bn1"))
                    y = bn(conv(y, p + "conv2", 1, 1), p + "bn2")
                x = relu(y + sc)

    if m.version == 2:
        x = relu(bn(x, "bn_final"))
    x = x.mean(dim=(2, 3))
    x = F.linear(x, T(args["fc1_weight"]), T(args["fc1_bias"]))
    return x.numpy()


@pytest.mark.integration
@pytest.mark.parametrize("depth,dataset,version,network,hw", [
    (20, "cifar10", 1, "resnet", (32, 32)),    # basic v1, CIFAR stem
    (20, "cifar10", 2, "resnet", (32, 32)),    # pre-act v2 + bn_data/final
    (18, "imagenet", 1, "resnet", (64, 64)),   # basic v1, ImageNet stem
    (50, "imagenet", 1, "resnet", (56, 56)),   # bottleneck + projections
    (50, "imagenet", 1, "resnext", (56, 56)),  # grouped 3x3 export layout
])
def test_export_matches_torch(depth, dataset, version, network, hw):
    cfg = Config()
    cfg.model.depth = depth
    cfg.model.dataset = dataset
    cfg.model.version = version
    cfg.model.network = network
    cfg.data.num_classes = 10

    model = get_model(cfg)
    h, w = hw
    x = np.random.default_rng(1).normal(0, 1, (2, h, w, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    variables = _randomize(variables)

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    args, auxs = export_mxnet_params(
        variables["params"], variables["batch_stats"])
    theirs = _torch_forward(x, args, auxs, cfg)

    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)
