"""MXNet name-mapped export/import round trip (SURVEY.md §5 parity shim)."""

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.config import Config
from resnet_tpu.models import get_model
from resnet_tpu.utils.export import (export_mxnet_params,
                                     import_mxnet_params,
                                     save_mxnet_style)


def _init(depth=50):
    cfg = Config()
    cfg.model.depth = depth
    cfg.data.num_classes = 10
    cfg.data.image_shape = (32, 32, 3)
    model = get_model(cfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    return v


def test_names_and_layouts():
    v = _init()
    args, auxs = export_mxnet_params(v["params"], v["batch_stats"])
    # reference naming convention (ref:symbol/resnet.py name scopes)
    assert "conv0_weight" in args
    assert "bn0_gamma" in args and "bn0_beta" in args
    assert "stage1_unit1_conv1_weight" in args
    assert "stage1_unit1_sc_weight" in args
    assert "stage4_unit3_bn3_gamma" in args
    assert "fc1_weight" in args and "fc1_bias" in args
    assert "bn0_moving_mean" in auxs and "bn0_moving_var" in auxs
    # OIHW layout: conv0 is 7x7x3->64 => (64, 3, 7, 7)
    assert args["conv0_weight"].shape == (64, 3, 7, 7)
    # fc: (classes, features)
    assert args["fc1_weight"].shape == (10, 2048)


def test_round_trip():
    v = _init()
    args, auxs = export_mxnet_params(v["params"], v["batch_stats"])
    p2, bs2 = import_mxnet_params(args, auxs, v["params"], v["batch_stats"])
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(v["batch_stats"]),
                    jax.tree.leaves(bs2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_npz(tmp_path):
    v = _init()
    out = save_mxnet_style(str(tmp_path / "resnet"), 3, v["params"],
                           v["batch_stats"])
    z = np.load(out)
    assert "arg:conv0_weight" in z and "aux:bn0_moving_mean" in z
