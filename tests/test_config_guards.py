"""Config-combination guards: flags must compose or refuse loudly."""

import jax
import pytest

from resnet_tpu.config import Config
from resnet_tpu.models.registry import get_model


def test_unit_chain_rejects_bn_subsample():
    cfg = Config()
    cfg.train.unit_chain = "xla"
    cfg.train.bn_subsample = 8
    with pytest.raises(ValueError, match="unit-chain"):
        get_model(cfg)


def test_unit_chain_rejects_remat_policy():
    cfg = Config()
    cfg.train.unit_chain = "pallas"
    cfg.train.remat_policy = "conv"
    with pytest.raises(ValueError, match="unit-chain"):
        get_model(cfg)


def test_unit_chain_alone_ok():
    cfg = Config()
    cfg.train.unit_chain = "xla"
    get_model(cfg)


def test_solver_rescales_bn_subsample_under_shard_map():
    """bn_subsample is per-replica; shard_map already splits the batch, so
    the Solver keeps the ABSOLUTE stats-sample count by dividing by the
    replica count (batch 256 / 8 devices / subsample 8 would otherwise
    compute stats from 4 images instead of the reference's 32)."""
    from resnet_tpu.train.solver import Solver
    cfg = Config()
    cfg.model.depth = 20
    cfg.model.dataset = "cifar10"
    cfg.data.num_classes = 10
    cfg.data.image_shape = (16, 16, 3)
    cfg.data.pipeline = "memory"
    cfg.data.num_examples = 64
    cfg.train.batch_size = 64
    cfg.train.num_devices = len(jax.devices())  # conftest: 8 virtual
    cfg.train.dp_mode = "shard_map"
    cfg.train.bn_subsample = 8
    cfg.train.model_prefix = ""
    assert cfg.train.num_devices == 8
    solver = Solver(cfg)
    # the Solver's private copy carries the effective value...
    assert solver.cfg.train.bn_subsample == 1
    # ...and the caller's cfg is untouched (a second Solver built from the
    # same object must see the same knobs — no in-place rescale)
    assert cfg.train.bn_subsample == 8
    solver2 = Solver(cfg)
    assert solver2.cfg.train.bn_subsample == 1
