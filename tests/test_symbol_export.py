"""symbol.json export (utils/symbol_export.py).

The load-bearing gate: the symbol's variable set must equal the REAL
model's exported parameter names exactly (same builder conventions), so
the emitted ``-symbol.json`` + ``.params`` pair is internally consistent
— an MXNet bind would find every arg/aux the graph declares (v2's fixed
``bn_data_gamma`` excepted, documented in the module docstring).
"""

import json

import jax
import jax.numpy as jnp
import pytest

from resnet_tpu.config import Config
from resnet_tpu.models import get_model
from resnet_tpu.utils.export import export_mxnet_params
from resnet_tpu.utils.symbol_export import save_symbol, symbol_json


def _cfg(network="resnet", depth=18, version=1, dataset="imagenet"):
    cfg = Config()
    cfg.model.network = network
    cfg.model.depth = depth
    cfg.model.version = version
    cfg.model.dataset = dataset
    cfg.data.num_classes = 10
    cfg.data.image_shape = (32, 32, 3)
    return cfg


CASES = [
    _cfg("resnet", 18, 1),
    _cfg("resnet", 50, 1),
    _cfg("resnet", 50, 2),
    _cfg("resnext", 50, 1),
    _cfg("resnet", 20, 1, dataset="cifar10"),
]
IDS = ["r18v1", "r50v1", "r50v2", "x50", "cifar20"]


@pytest.mark.parametrize("cfg", CASES, ids=IDS)
def test_variable_set_matches_params_export(cfg):
    graph = json.loads(symbol_json(cfg))
    null_names = {graph["nodes"][i]["name"] for i in graph["arg_nodes"]}

    model = get_model(cfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    args, auxs = export_mxnet_params(v["params"], v["batch_stats"])
    want = set(args) | set(auxs) | {"data", "softmax_label"}
    if cfg.model.version == 2:
        # fix_gamma BNs: MXNet's symbol declares a (fixed) gamma our
        # flax tree never learns
        want |= {"bn_data_gamma"}
    assert null_names == want, (null_names ^ want)


@pytest.mark.parametrize("cfg", CASES, ids=IDS)
def test_graph_wellformed(cfg):
    graph = json.loads(symbol_json(cfg))
    nodes = graph["nodes"]
    # topological inputs, arg_nodes == null nodes, row_ptr consistent
    for i, n in enumerate(nodes):
        for src, out_idx, _ in n["inputs"]:
            assert src < i
            n_out = 3 if nodes[src]["op"] == "BatchNorm" else 1
            assert 0 <= out_idx < n_out
    assert graph["arg_nodes"] == [
        i for i, n in enumerate(nodes) if n["op"] == "null"]
    ptr = graph["node_row_ptr"]
    assert len(ptr) == len(nodes) + 1
    for i, n in enumerate(nodes):
        assert ptr[i + 1] - ptr[i] == (3 if n["op"] == "BatchNorm" else 1)
    assert graph["heads"] == [[len(nodes) - 1, 0, 0]]
    assert nodes[-1]["op"] == "SoftmaxOutput"
    # unique names (MXNet requires)
    names = [n["name"] for n in nodes]
    assert len(names) == len(set(names))


def test_depth_op_counts():
    """Conv counts per depth table (ref:symbol/resnet.py): the '50' in
    ResNet-50 counts convs + fc, excluding projection shortcuts."""
    for depth, expect in [(18, 18), (34, 34), (50, 50), (101, 101),
                          (152, 152)]:
        graph = json.loads(symbol_json(_cfg(depth=depth)))
        convs = [n for n in graph["nodes"] if n["op"] == "Convolution"
                 and not n["name"].endswith("_sc")]
        fcs = [n for n in graph["nodes"] if n["op"] == "FullyConnected"]
        assert len(convs) + len(fcs) == expect, depth


def test_resnext_num_group():
    graph = json.loads(symbol_json(_cfg("resnext", 50)))
    grouped = [n for n in graph["nodes"] if n["op"] == "Convolution"
               and n.get("attrs", {}).get("num_group") == "32"]
    # one grouped 3x3 per bottleneck unit: 3+4+6+3
    assert len(grouped) == 16
    assert grouped[0]["attrs"]["num_filter"] == "128"   # 32 groups x 4


ROUNDTRIP_CASES = CASES + [
    _cfg("resnet", 101, 1),
    _cfg("resnet", 152, 1),
    _cfg("resnet", 56, 1, dataset="cifar10"),
    _cfg("resnet", 164, 2, dataset="cifar10"),   # CIFAR 9n+2 bottleneck
    _cfg("resnext", 101, 1),
]
ROUNDTRIP_IDS = IDS + ["r101", "r152", "cifar56", "cifar164v2", "x101"]


@pytest.mark.parametrize("cfg", ROUNDTRIP_CASES, ids=ROUNDTRIP_IDS)
def test_symbol_roundtrip(cfg):
    """export -> parse -> identical model config (VERDICT r3 #7: a foreign
    MXNet checkpoint pair configures the network itself, like
    mx.model.load_checkpoint loading ``prefix-symbol.json``)."""
    from resnet_tpu.utils.symbol_export import parse_symbol_json

    info = parse_symbol_json(symbol_json(cfg))
    m = info["model"]
    assert m["network"] == cfg.model.network
    assert m["depth"] == cfg.model.depth
    assert m["version"] == cfg.model.version
    assert m["dataset"] == cfg.model.dataset
    assert m["bn_mom"] == pytest.approx(cfg.model.bn_mom)
    assert m["bn_eps"] == pytest.approx(cfg.model.bn_eps)
    if cfg.model.network == "resnext":
        assert m["cardinality"] == cfg.model.cardinality
        assert m["group_width"] == cfg.model.group_width
    assert info["num_classes"] == cfg.data.num_classes


def test_config_from_symbol_overlay(tmp_path):
    """config_from_symbol keeps pipeline/train knobs, replaces structure."""
    from resnet_tpu.utils.symbol_export import config_from_symbol

    src = _cfg("resnext", 50, 1)
    src.data.num_classes = 37
    path = save_symbol(str(tmp_path / "foreign"), src)

    base = _cfg("resnet", 18, 1)            # wrong structure on purpose
    base.train.dtype = "bfloat16"
    base.data.pipeline = "memory"
    out = config_from_symbol(base, path)
    assert out.model.network == "resnext"
    assert out.model.depth == 50
    assert out.data.num_classes == 37
    # non-structure knobs untouched
    assert out.train.dtype == "bfloat16"
    assert out.data.pipeline == "memory"
    assert out.data.image_shape == base.data.image_shape


def test_checkpoint_pair(tmp_path):
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.export import save_mxnet_style

    cfg = _cfg(depth=18)
    state = create_train_state(cfg)
    prefix = str(tmp_path / "model")
    sym = save_symbol(prefix, cfg)
    params = save_mxnet_style(prefix, 1, state.params, state.batch_stats,
                              fmt="params")
    assert sym.endswith("model-symbol.json")
    assert params.endswith("model-0001.params")
    json.load(open(sym))   # parses
