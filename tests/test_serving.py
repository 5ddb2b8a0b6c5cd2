"""Serving-artifact export round-trip (utils/serving.py, tools/serve_export).

The deployment analog of the reference's save_checkpoint -> load_checkpoint
-> bind(for_training=False) serving flow (SURVEY.md §3.4): the exported
StableHLO artifact must reproduce the live model's logits bit-for-bit on
the same backend, serve ANY batch size through its symbolic batch dim,
and carry a manifest that describes the calling convention.
"""

import json
import os

import jax
import numpy as np
import pytest

from resnet_tpu.config import cifar10_resnet18
from resnet_tpu.train.state import create_train_state
from resnet_tpu.utils.serving import (export_serving, load_serving,
                                      make_serving_fn)


def _tiny_cfg():
    cfg = cifar10_resnet18()
    cfg.model.depth = 8
    cfg.data.num_classes = 10
    return cfg


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = _tiny_cfg()
    state = create_train_state(cfg)
    prefix = str(tmp_path_factory.mktemp("serve") / "artifact")
    # cpu-only lowering in the test env; the tool defaults to cpu+tpu
    artifact, manifest = export_serving(
        cfg, state.params, state.batch_stats, prefix, platforms=("cpu",))
    return cfg, state, prefix, artifact, manifest


def test_artifact_files_and_manifest(exported):
    cfg, _, _, artifact, manifest = exported
    assert os.path.getsize(artifact) > 0
    m = json.load(open(manifest))
    assert m["input"]["dtype"] == "uint8"
    assert m["input"]["shape"] == ["b", 32, 32, 3]
    assert m["output"]["shape"] == ["b", 10]
    assert m["depth"] == cfg.model.depth
    assert m["normalize"]["mean_rgb"] == list(cfg.data.mean_rgb)


def test_roundtrip_logits_match_live_model(exported):
    cfg, state, prefix, _, _ = exported
    serve, _ = load_serving(prefix)
    live = jax.jit(make_serving_fn(cfg, state.params, state.batch_stats))
    x = np.random.default_rng(0).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8)
    got = np.asarray(serve(x))
    want = np.asarray(live(x))
    assert got.shape == (4, 10) and got.dtype == np.float32
    # same backend, same program semantics -> bitwise
    np.testing.assert_array_equal(got, want)


def test_symbolic_batch_serves_any_size(exported):
    _, _, prefix, _, _ = exported
    serve, _ = load_serving(prefix)
    rng = np.random.default_rng(1)
    for b in (1, 3, 7):
        out = np.asarray(serve(rng.integers(
            0, 256, (b, 32, 32, 3), dtype=np.uint8)))
        assert out.shape == (b, 10)
        assert np.all(np.isfinite(out))


def test_pinned_batch_export(tmp_path):
    cfg = _tiny_cfg()
    state = create_train_state(cfg)
    prefix = str(tmp_path / "pinned")
    export_serving(cfg, state.params, state.batch_stats, prefix,
                   batch_size=2, platforms=("cpu",))
    serve, manifest = load_serving(prefix)
    assert manifest["input"]["shape"][0] == 2
    x = np.zeros((2, 32, 32, 3), np.uint8)
    assert np.asarray(serve(x)).shape == (2, 10)


def test_sharded_export_matches_single_device(exported, tmp_path):
    """num_devices=8: the batch-sharded artifact (the DP serving layout)
    must produce the same logits as the single-device artifact, serve any
    multiple-of-8 batch through its 8*b symbolic dim, and re-stage plain
    host arrays onto the mesh inside load_serving's wrapper."""
    cfg, state, single_prefix, _, _ = exported
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    prefix = str(tmp_path / "sharded")
    _, manifest_path = export_serving(
        cfg, state.params, state.batch_stats, prefix,
        platforms=("cpu",), num_devices=8)
    m = json.load(open(manifest_path))
    assert m["num_devices"] == 8
    assert m["input"]["shape"][0] == "8*b"

    serve, _ = load_serving(prefix)
    single, _ = load_serving(single_prefix)
    rng = np.random.default_rng(2)
    for b in (8, 24):
        x = rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(serve(x))          # plain np: wrapper stages it
        want = np.asarray(single(x))
        assert got.shape == (b, 10)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_export_validates_batch_divisibility(exported):
    cfg, state, _, _, _ = exported
    with pytest.raises(ValueError, match="divide"):
        export_serving(cfg, state.params, state.batch_stats, "/tmp/x",
                       batch_size=6, platforms=("cpu",), num_devices=8)


@pytest.mark.integration
def test_resnext_roundtrip(tmp_path):
    """The other model family serves too: ResNeXt (grouped 3x3 lowering)
    export -> load -> bitwise logit parity, small ImageNet-style shapes."""
    from resnet_tpu.config import Config

    cfg = Config()
    cfg.model.network = "resnext"
    cfg.model.depth = 50
    cfg.data.num_classes = 10
    cfg.data.image_shape = (56, 56, 3)
    state = create_train_state(cfg)
    prefix = str(tmp_path / "resnext")
    export_serving(cfg, state.params, state.batch_stats, prefix,
                   batch_size=2, platforms=("cpu",))
    serve, manifest = load_serving(prefix)
    assert manifest["network"] == "resnext"
    live = jax.jit(make_serving_fn(cfg, state.params, state.batch_stats))
    x = np.random.default_rng(2).integers(
        0, 256, (2, 56, 56, 3), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(serve(x)),
                                  np.asarray(live(x)))


def test_cli_export_and_check(tmp_path):
    """tools/serve_export.py end to end: save a checkpoint, export with
    --check (artifact-vs-live gate), verify the files land."""
    from resnet_tpu.train import checkpoint as ckpt
    from tools.serve_export import main

    cfg = _tiny_cfg()
    cfg.train.model_prefix = str(tmp_path / "ckpt" / "model")
    state = create_train_state(cfg)
    ckpt.save_checkpoint(cfg.train.model_prefix, 1, state)
    out = str(tmp_path / "artifact")
    rc = main(["--out", out, "--platforms", "cpu", "--check",
               "--serve-batch-size", "2", "--",
               "--preset", "cifar10_resnet18", "--depth", "8",
               "--model-prefix", cfg.train.model_prefix,
               "--load-epoch", "1"])
    assert rc == 0
    assert os.path.exists(out + ".stablehlo")
    assert os.path.exists(out + ".json")
