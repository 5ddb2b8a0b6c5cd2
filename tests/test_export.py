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


class TestMXNetParamsBinary:
    """The real .params byte format (utils/mxnet_params.py): round trip,
    byte-level golden pin, build-variant tolerance, loud failures."""

    def test_round_trip_all_dtypes(self, tmp_path):
        from resnet_tpu.utils.mxnet_params import load_params, save_params

        rng = np.random.default_rng(0)
        args = {
            "stage1_unit1_conv1_weight":
                rng.standard_normal((4, 3, 3, 3)).astype(np.float32),
            "fc1_bias": rng.standard_normal((10,)).astype(np.float64),
            "counts": rng.integers(0, 100, (5, 2)).astype(np.int32),
            "bytes": rng.integers(0, 255, (7,)).astype(np.uint8),
            "half": rng.standard_normal((2, 2)).astype(np.float16),
        }
        auxs = {"bn1_moving_mean": np.arange(8, dtype=np.float32)}
        path = str(tmp_path / "rt.params")
        save_params(path, args, auxs)
        a2, x2 = load_params(path)
        assert set(a2) == set(args) and set(x2) == set(auxs)
        for k in args:
            assert a2[k].dtype == args[k].dtype
            np.testing.assert_array_equal(a2[k], args[k])
        np.testing.assert_array_equal(x2["bn1_moving_mean"],
                                      auxs["bn1_moving_mean"])

    def test_golden_bytes(self, tmp_path):
        """Byte-for-byte pin of the serialized layout (module docstring
        table): format drift trips here, not in a downstream consumer."""
        import struct

        from resnet_tpu.utils.mxnet_params import save_params

        path = str(tmp_path / "g.params")
        save_params(path, {"w": np.array([[1.0, 2.0]], np.float32)}, {})
        got = open(path, "rb").read()
        want = (
            struct.pack("<QQQ", 0x112, 0, 1)          # list magic, N=1
            + struct.pack("<Ii", 0xF993FAC9, 1)       # V2 magic, dense
            + struct.pack("<I", 2)                    # ndim
            + struct.pack("<ii", 1, 2)                # dims (int32)
            + struct.pack("<ii", 1, 0)                # context cpu:0
            + struct.pack("<i", 0)                    # float32
            + np.array([[1.0, 2.0]], np.float32).tobytes()
            + struct.pack("<Q", 1)                    # name count
            + struct.pack("<Q", 5) + b"arg:w")
        assert got == want

    def test_reads_int64_dim_builds(self, tmp_path):
        """Large-tensor MXNet builds serialize int64 dims; the reader must
        disambiguate (validated, not guessed)."""
        import struct

        from resnet_tpu.utils.mxnet_params import load_params

        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        buf = (struct.pack("<QQQ", 0x112, 0, 1)
               + struct.pack("<Ii", 0xF993FAC9, 1)
               + struct.pack("<I", 2) + struct.pack("<qq", 2, 3)  # int64
               + struct.pack("<ii", 1, 0) + struct.pack("<i", 0)
               + arr.tobytes()
               + struct.pack("<Q", 1) + struct.pack("<Q", 7) + b"arg:big")
        path = tmp_path / "i64.params"
        path.write_bytes(buf)
        args, _ = load_params(str(path))
        np.testing.assert_array_equal(args["big"], arr)

    def test_reads_legacy_v1(self, tmp_path):
        import struct

        from resnet_tpu.utils.mxnet_params import load_params

        arr = np.arange(4, dtype=np.float32)
        buf = (struct.pack("<QQQ", 0x112, 0, 1)
               + struct.pack("<I", 0xF993FAC8)        # V1: no stype field
               + struct.pack("<I", 1) + struct.pack("<I", 4)  # uint32 dims
               + struct.pack("<ii", 1, 0) + struct.pack("<i", 0)
               + arr.tobytes()
               + struct.pack("<Q", 1) + struct.pack("<Q", 5) + b"arg:v")
        path = tmp_path / "v1.params"
        path.write_bytes(buf)
        args, _ = load_params(str(path))
        np.testing.assert_array_equal(args["v"], arr)

    def test_loud_failures(self, tmp_path):
        import struct

        import pytest

        from resnet_tpu.utils.mxnet_params import (MXNetParamsError,
                                                   load_params)

        bad_magic = tmp_path / "bad.params"
        bad_magic.write_bytes(struct.pack("<QQQ", 0xDEAD, 0, 0))
        with pytest.raises(MXNetParamsError, match="list magic"):
            load_params(str(bad_magic))

        trunc = tmp_path / "trunc.params"
        trunc.write_bytes(
            struct.pack("<QQQ", 0x112, 0, 1)
            + struct.pack("<Ii", 0xF993FAC9, 1) + struct.pack("<I", 1)
            + struct.pack("<i", 1000000))   # dims promise data that isn't there
        with pytest.raises(MXNetParamsError):
            load_params(str(trunc))

    def test_model_checkpoint_interchange(self, tmp_path):
        """export -> REAL .params -> load_mxnet_checkpoint == identity on
        the full R50 tree (the switch-from-the-reference path)."""
        from resnet_tpu.utils.export import load_mxnet_checkpoint

        v = _init()
        prefix = str(tmp_path / "model")
        out = save_mxnet_style(prefix, 3, v["params"], v["batch_stats"],
                               fmt="params")
        assert out.endswith("model-0003.params")
        p2, bs2 = load_mxnet_checkpoint(prefix, 3, v["params"],
                                        v["batch_stats"])
        for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(v["batch_stats"]),
                        jax.tree.leaves(bs2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_solver_resumes_from_mxnet_checkpoint(self, tmp_path):
        """--model-prefix/--load-epoch pointed at a reference-format
        checkpoint: the Solver restores weights+BN stats through the
        binary shim and recovers the LR-schedule step from the epoch
        (SURVEY.md §3.4 resume semantics)."""
        import dataclasses

        from resnet_tpu.config import cifar10_resnet18
        from resnet_tpu.train.solver import Solver
        from resnet_tpu.train.state import create_train_state

        cfg = cifar10_resnet18()
        cfg.model.depth = 20
        cfg.data.num_examples = 128
        cfg.data.image_shape = (16, 16, 3)
        cfg.train = dataclasses.replace(
            cfg.train, batch_size=32, model_prefix=str(tmp_path / "mx"),
            load_epoch=2)

        donor = create_train_state(cfg)
        donor = donor.replace(params=jax.tree.map(
            lambda x: x + 1.5, donor.params))
        save_mxnet_style(cfg.train.model_prefix, 2, donor.params,
                         donor.batch_stats, fmt="params")

        state = Solver(cfg).init_state()
        assert int(state.step) == 2 * (128 // 32)
        for a, b in zip(jax.tree.leaves(donor.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
