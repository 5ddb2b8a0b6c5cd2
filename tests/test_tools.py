"""Tool-surface tests: im2rec -> train -> validate -> predict in-process."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Pack a tiny tree, train 3 epochs, checkpoint."""
    from PIL import Image

    from resnet_tpu.config import Config
    from resnet_tpu.data.im2rec import build_list, pack
    from resnet_tpu.data.loader import make_train_iter
    from resnet_tpu.train.solver import Solver

    root = tmp_path_factory.mktemp("tree")
    rng = np.random.default_rng(0)
    for cls in range(3):
        d = root / f"class_{cls}"
        d.mkdir()
        for i in range(8):
            arr = (np.full((24, 24, 3), cls * 80 + 20)
                   + rng.integers(0, 20, (24, 24, 3))).astype(np.uint8)
            Image.fromarray(arr).save(d / f"i{i}.jpg", quality=95)
    prefix = str(root / "train")
    pack(str(root), prefix, build_list(str(root)))
    for ext in (".rec", ".idx"):
        os.link(prefix + ext, str(root / ("val" + ext)))

    cfg = Config()
    cfg.model.depth = 20
    cfg.model.dataset = "cifar10"
    cfg.model.bn_mom = 0.5
    cfg.data.num_classes = 3
    cfg.data.num_examples = 24
    cfg.data.image_shape = (24, 24, 3)
    cfg.data.data_dir = str(root)
    cfg.data.pipeline = "record"
    cfg.data.preprocess_threads = 2
    cfg.train.batch_size = 8
    cfg.train.num_epochs = 3
    cfg.train.lr = 0.05
    cfg.train.frequent = 2
    cfg.train.model_prefix = str(root / "ck")
    solver = Solver(cfg)
    it = make_train_iter(cfg)
    solver.fit(it, None)
    return {"cfg": cfg, "root": str(root)}


def _cfg_args(cfg):
    return ["--network", "resnet", "--depth", "20", "--dataset", "cifar10",
            "--num-classes", "3", "--num-examples", "24",
            "--image-shape", "24,24,3", "--data-dir", cfg.data.data_dir,
            "--batch-size", "8", "--model-prefix", cfg.train.model_prefix,
            "--load-epoch", "3", "--preprocess-threads", "2"]


def test_validate_tool(trained, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import validate
    rc = validate.main(_cfg_args(trained["cfg"]) + ["--pipeline", "record"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "accuracy" in out


def test_predict_tool(trained, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import predict
    img = os.path.join(trained["root"], "class_2", "i0.jpg")
    rc = predict.main(["--inputs", img, "--top-k", "2"]
                      + _cfg_args(trained["cfg"]))
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines and lines[0]["top_k"][0]["class"] == 2


def test_im2rec_list_round_trip(tmp_path):
    from resnet_tpu.data.im2rec import read_list, write_list
    entries = [(0, 1.0, "a/b.jpg"), (1, 2.0, "c/d.jpg")]
    write_list(entries, str(tmp_path / "x.lst"))
    assert read_list(str(tmp_path / "x.lst")) == entries


def test_predict_from_mxnet_params(trained, capsys):
    """predict.py pointed at a REFERENCE-format checkpoint: export the
    trained weights as the MXNet .params binary under a different prefix
    (no orbax dir there) and classify through the shim — the
    switch-from-the-reference user story end to end."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import predict

    from resnet_tpu.train import checkpoint as ckpt
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.export import save_mxnet_style

    cfg = trained["cfg"]
    state = create_train_state(cfg)
    state, _ = ckpt.load_checkpoint(cfg.train.model_prefix, 3, state)
    mx_prefix = os.path.join(trained["root"], "mxck")
    save_mxnet_style(mx_prefix, 3, state.params, state.batch_stats,
                     fmt="params")

    img = os.path.join(trained["root"], "class_2", "i0.jpg")
    args = [a if a != cfg.train.model_prefix else mx_prefix
            for a in _cfg_args(cfg)]
    rc = predict.main(["--inputs", img, "--top-k", "2"] + args)
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert lines and lines[0]["top_k"][0]["class"] == 2


def test_export_mxnet_tool(trained, capsys):
    """orbax checkpoint -> the reference's -symbol.json/.params pair."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import export_mxnet

    from resnet_tpu.utils.mxnet_params import load_params

    cfg = trained["cfg"]
    out = os.path.join(trained["root"], "exported", "model")
    rc = export_mxnet.main(["--out", out] + _cfg_args(cfg))
    assert rc == 0
    assert os.path.exists(out + "-symbol.json")
    args_d, auxs_d = load_params(out + "-0003.params")
    assert "conv0_weight" in args_d and "bn0_moving_mean" in auxs_d
    graph = json.load(open(out + "-symbol.json"))
    null_names = {graph["nodes"][i]["name"] for i in graph["arg_nodes"]}
    assert set(args_d) | set(auxs_d) | {"data", "softmax_label"} \
        == null_names
