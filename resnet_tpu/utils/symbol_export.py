"""MXNet ``-symbol.json`` export: the graph half of the checkpoint pair.

``mx.model.save_checkpoint`` writes ``{prefix}-symbol.json`` (the NNVM
graph, ``sym.tojson()``) next to the ``.params`` blob (SURVEY.md §3.4).
utils/mxnet_params.py covers the params half; this module emits the graph
half so the exported pair is complete: an MXNet user can
``mx.model.load_checkpoint(prefix, epoch)`` and bind the result.

The builder mirrors ``models/resnet.py`` (same stems, stage/unit loop,
v1/v2 orderings, ResNeXt ``num_group``) with the reference's node names
(``ref:symbol/resnet.py`` name scopes — ``stageN_unitM_conv1``, ``bn0``,
``fc1``, ``softmax``), so the symbol's variable set matches
``utils/export.py``'s parameter names exactly; the structural test pins
that equality per family/depth (tests/test_symbol_export.py).

JSON layout (NNVM graph, as ``nnvm::pass::SaveJSON`` emits it):
  nodes:        [{op, name, attrs?, inputs: [[node, out_idx, version]]}]
  arg_nodes:    indices of every ``op == "null"`` node (data, weights, BN
                stats, label)
  node_row_ptr: cumulative output counts (BatchNorm contributes 3 —
                out/mean/var; everything else 1)
  heads:        [[last_node, 0, 0]]
  attrs:        {"mxnet_version": ["int", 10600]}

Caveats (documented, not hidden): numeric attrs are serialized in
MXNet's tuple/str conventions; no MXNet exists in this environment to
load-test against (zero egress), so the format is pinned by structure
tests + the parameter-name equality gate. v2 graphs carry the
reference's leading ``bn_data`` with ``fix_gamma=True`` — MXNet holds a
(fixed) gamma argument our flax tree does not learn; bind with
``allow_missing=True`` or inject a ones vector for ``bn_data_gamma``.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from resnet_tpu.config import Config
from resnet_tpu.models.registry import model_spec


class _Graph:
    def __init__(self):
        self.nodes: List[dict] = []
        self.arg_nodes: List[int] = []
        self.row_ptr: List[int] = [0]

    def var(self, name: str) -> int:
        return self._add({"op": "null", "name": name, "inputs": []}, 1)

    def op(self, op: str, name: str, inputs: List[int],
           attrs: Optional[Dict[str, str]] = None, n_out: int = 1) -> int:
        node = {"op": op, "name": name,
                "inputs": [[i, 0, 0] for i in inputs]}
        if attrs:
            node["attrs"] = attrs
        return self._add(node, n_out)

    def _add(self, node: dict, n_out: int) -> int:
        idx = len(self.nodes)
        self.nodes.append(node)
        if node["op"] == "null":
            self.arg_nodes.append(idx)
        self.row_ptr.append(self.row_ptr[-1] + n_out)
        return idx

    def json(self, head: int) -> str:
        return json.dumps({
            "nodes": self.nodes,
            "arg_nodes": self.arg_nodes,
            "node_row_ptr": self.row_ptr,
            "heads": [[head, 0, 0]],
            "attrs": {"mxnet_version": ["int", 10600]},
        }, indent=2)


def _conv(g: _Graph, x: int, name: str, num_filter: int, kernel, stride,
          pad, num_group: int = 1) -> int:
    attrs = {"kernel": str(kernel), "stride": str(stride),
             "pad": str(pad), "num_filter": str(num_filter),
             "no_bias": "True", "workspace": "512"}
    if num_group > 1:
        attrs["num_group"] = str(num_group)
    w = g.var(f"{name}_weight")
    return g.op("Convolution", name, [x, w], attrs)


def _bn(g: _Graph, x: int, name: str, mom: float, eps: float,
        fix_gamma: bool = False) -> int:
    gamma = g.var(f"{name}_gamma")
    beta = g.var(f"{name}_beta")
    mean = g.var(f"{name}_moving_mean")
    var = g.var(f"{name}_moving_var")
    return g.op("BatchNorm", name, [x, gamma, beta, mean, var],
                {"momentum": str(mom), "eps": str(eps),
                 "fix_gamma": str(fix_gamma), "use_global_stats": "False"},
                n_out=3)


def _relu(g: _Graph, x: int, name: str) -> int:
    return g.op("Activation", name, [x], {"act_type": "relu"})


def _residual_unit(g: _Graph, x: int, name: str, filters: int, mid: int,
                   stride, dim_match: bool, bottleneck: bool, version: int,
                   num_group: int, mom: float, eps: float) -> int:
    s, p1 = str(stride), "(1, 1)"
    if version == 2:
        bn1 = _bn(g, x, f"{name}_bn1", mom, eps)
        act1 = _relu(g, bn1, f"{name}_relu1")
        sc = x if dim_match else _conv(
            g, act1, f"{name}_sc", filters, "(1, 1)", s, "(0, 0)")
        if bottleneck:
            y = _conv(g, act1, f"{name}_conv1", mid, "(1, 1)", "(1, 1)",
                      "(0, 0)")
            y = _relu(g, _bn(g, y, f"{name}_bn2", mom, eps),
                      f"{name}_relu2")
            y = _conv(g, y, f"{name}_conv2", mid, "(3, 3)", s, p1,
                      num_group)
            y = _relu(g, _bn(g, y, f"{name}_bn3", mom, eps),
                      f"{name}_relu3")
            y = _conv(g, y, f"{name}_conv3", filters, "(1, 1)", "(1, 1)",
                      "(0, 0)")
        else:
            y = _conv(g, act1, f"{name}_conv1", mid, "(3, 3)", s, p1)
            y = _relu(g, _bn(g, y, f"{name}_bn2", mom, eps),
                      f"{name}_relu2")
            y = _conv(g, y, f"{name}_conv2", filters, "(3, 3)", "(1, 1)",
                      p1)
        return g.op("elemwise_add", f"{name}_plus", [y, sc])

    # v1 post-activation
    if dim_match:
        sc = x
    else:
        sc = _conv(g, x, f"{name}_sc", filters, "(1, 1)", s, "(0, 0)")
        sc = _bn(g, sc, f"{name}_sc_bn", mom, eps)
    if bottleneck:
        y = _conv(g, x, f"{name}_conv1", mid, "(1, 1)", "(1, 1)", "(0, 0)")
        y = _relu(g, _bn(g, y, f"{name}_bn1", mom, eps), f"{name}_relu1")
        y = _conv(g, y, f"{name}_conv2", mid, "(3, 3)", s, p1, num_group)
        y = _relu(g, _bn(g, y, f"{name}_bn2", mom, eps), f"{name}_relu2")
        y = _conv(g, y, f"{name}_conv3", filters, "(1, 1)", "(1, 1)",
                  "(0, 0)")
        y = _bn(g, y, f"{name}_bn3", mom, eps)
    else:
        y = _conv(g, x, f"{name}_conv1", mid, "(3, 3)", s, p1)
        y = _relu(g, _bn(g, y, f"{name}_bn1", mom, eps), f"{name}_relu1")
        y = _conv(g, y, f"{name}_conv2", filters, "(3, 3)", "(1, 1)", p1)
        y = _bn(g, y, f"{name}_bn2", mom, eps)
    add = g.op("elemwise_add", f"{name}_plus", [y, sc])
    return _relu(g, add, f"{name}_relu")


def symbol_json(cfg: Config) -> str:
    """Build the NNVM symbol JSON for ``cfg``'s model (mirrors
    ``models/resnet.py`` — same depth tables, stems, width rules)."""
    m = cfg.model
    units, filters, bottleneck, cifar = model_spec(m, cfg.data.num_classes)
    mom, eps = m.bn_mom, m.bn_eps
    cardinality = m.cardinality if m.network == "resnext" else 1

    g = _Graph()
    x = g.var("data")
    if m.version == 2:
        x = _bn(g, x, "bn_data", mom, eps, fix_gamma=True)
    if cifar:
        x = _conv(g, x, "conv0", filters[0], "(3, 3)", "(1, 1)", "(1, 1)")
        if m.version == 1:
            x = _relu(g, _bn(g, x, "bn0", mom, eps), "relu0")
    else:
        x = _conv(g, x, "conv0", filters[0], "(7, 7)", "(2, 2)", "(3, 3)")
        x = _relu(g, _bn(g, x, "bn0", mom, eps), "relu0")
        x = g.op("Pooling", "pool0", [x],
                 {"kernel": "(3, 3)", "stride": "(2, 2)", "pad": "(1, 1)",
                  "pool_type": "max"})

    for stage, (n_units, n_filter) in enumerate(zip(units, filters[1:])):
        for unit in range(n_units):
            first = unit == 0
            stride = "(2, 2)" if (first and stage > 0) else "(1, 1)"
            if cardinality > 1 and bottleneck:
                mid = max(n_filter * cardinality * m.group_width // 256,
                          cardinality)
            elif bottleneck:
                mid = n_filter // 4
            else:
                mid = n_filter
            x = _residual_unit(
                g, x, f"stage{stage + 1}_unit{unit + 1}", n_filter, mid,
                stride, dim_match=not first, bottleneck=bottleneck,
                version=m.version,
                num_group=cardinality if bottleneck else 1,
                mom=mom, eps=eps)

    if m.version == 2:
        x = _relu(g, _bn(g, x, "bn_final", mom, eps), "relu_final")
    x = g.op("Pooling", "pool1", [x],
             {"global_pool": "True", "kernel": "(7, 7)",
              "pool_type": "avg"})
    x = g.op("Flatten", "flatten0", [x])
    w = g.var("fc1_weight")
    b = g.var("fc1_bias")
    x = g.op("FullyConnected", "fc1", [x, w, b],
             {"num_hidden": str(cfg.data.num_classes)})
    label = g.var("softmax_label")
    head = g.op("SoftmaxOutput", "softmax", [x, label])
    return g.json(head)


def save_symbol(path_prefix: str, cfg: Config) -> str:
    """Write ``{prefix}-symbol.json`` (the reference checkpoint pair's
    graph half; pair with ``save_mxnet_style(..., fmt="params")``)."""
    out = f"{path_prefix}-symbol.json"
    with open(out, "w") as f:
        f.write(symbol_json(cfg))
    return out
