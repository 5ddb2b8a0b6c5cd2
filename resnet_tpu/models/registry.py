"""Model registry: (network, depth, dataset) → ResNet module.

Rebuilds the reference's symbol selection (ref:train_resnet.py chooses
``symbol.resnet.get_symbol`` / ``symbol.resnext.get_symbol`` from
``config.network`` + ``config.depth``) including both depth schemes:

  - ImageNet-style depths from the 18/34/50/101/152/200/269 table;
  - CIFAR 6n+2 (basic) / 9n+2 (bottleneck) three-stage nets for other depths
    when ``dataset='cifar10'`` (ref:symbol/resnet.py CIFAR branch).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from resnet_tpu.config import Config, ModelConfig
from resnet_tpu.models.resnet import (
    BOTTLENECK_MIN_DEPTH,
    CIFAR_FILTERS_BASIC,
    CIFAR_FILTERS_BOTTLENECK,
    FILTERS_BASIC,
    FILTERS_BOTTLENECK,
    IMAGENET_UNITS,
    ResNet,
)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def model_spec(m: ModelConfig, num_classes: int):
    """Resolve (units, filters, bottleneck, cifar_stem) for a config."""
    cifar = m.dataset == "cifar10"
    if m.depth in IMAGENET_UNITS:
        units = IMAGENET_UNITS[m.depth]
        bottleneck = m.depth >= BOTTLENECK_MIN_DEPTH
        filters = FILTERS_BOTTLENECK if bottleneck else FILTERS_BASIC
    elif cifar and (m.depth - 2) % 9 == 0 and m.depth >= 164:
        # CIFAR 9n+2 bottleneck (e.g. 164, 1001)
        n = (m.depth - 2) // 9
        units, filters, bottleneck = (n, n, n), CIFAR_FILTERS_BOTTLENECK, True
    elif cifar and (m.depth - 2) % 6 == 0:
        # CIFAR 6n+2 basic (e.g. 20, 56, 110)
        n = (m.depth - 2) // 6
        units, filters, bottleneck = (n, n, n), CIFAR_FILTERS_BASIC, False
    else:
        raise ValueError(f"unsupported depth {m.depth} for {m.dataset}")
    if m.network == "resnext" and not bottleneck:
        raise ValueError("resnext requires a bottleneck depth (>=50)")
    return units, filters, bottleneck, cifar


def get_model(cfg: Config, dtype: Any = None, remat: bool = None,
              fused: bool = None, unit_chain: str = None,
              bn_ema: bool = None,
              pallas_interpret: bool = False) -> ResNet:
    m = cfg.model
    units, filters, bottleneck, cifar = model_spec(m, cfg.data.num_classes)
    if fused is None:
        fused = getattr(cfg.train, "fused_convbn", False)
    if unit_chain is None:
        unit_chain = getattr(cfg.train, "unit_chain", "off")
    grouped_dense = getattr(cfg.train, "grouped_dense", False)
    grouped_merge = getattr(cfg.train, "grouped_merge", 0)
    bn_subsample = getattr(cfg.train, "bn_subsample", 1)
    bn_grouped = getattr(cfg.train, "bn_grouped", False)
    bn_stat_stride = getattr(cfg.train, "bn_stat_stride", 1)
    if bn_ema is None:
        bn_ema = getattr(cfg.train, "bn_ema", False)
    bn_ema_clamp = getattr(cfg.train, "bn_ema_clamp", 1.0)
    remat_policy = getattr(cfg.train, "remat_policy", "none")
    stem_s2d = getattr(cfg.train, "stem_s2d", False)
    pool_grad = getattr(cfg.train, "pool_grad", "sas")
    if bn_grouped and bn_subsample <= 1:
        raise ValueError(
            "--bn-grouped needs --bn-subsample > 1 (the number of "
            "independent normalization groups)")
    if bn_ema and 0 < bn_ema_clamp < 1:
        raise ValueError(
            "--bn-ema-clamp is a trust-region RATIO: >= 1 (1.0 = normalize "
            "with the live batch evidence, larger = more running-stats "
            "slack), or 0 to disable clamping entirely")
    if bn_ema and (bn_grouped or fused or unit_chain != "off"):
        # grouped normalizes each group with its OWN batch stats — the
        # opposite of normalizing with running stats; the fused/chain
        # kernels compute batch stats in their epilogues. Silently
        # ignoring either flag would run something other than what the
        # flags say.
        raise ValueError(
            "--bn-ema does not compose with --bn-grouped, --fused-convbn "
            "or --unit-chain (those compute/apply batch statistics); "
            "drop one of the flags")
    if unit_chain != "off" and (bn_subsample > 1 or bn_stat_stride > 1
                                or remat_policy == "conv"):
        # the chain dataflow computes full-batch stats in its epilogues
        # and manages its own residuals — silently ignoring these knobs
        # would benchmark something other than what the flags say
        raise ValueError(
            "--unit-chain does not compose with --bn-subsample > 1 or "
            "--remat-policy conv (the chain computes full-batch BN stats "
            "in-kernel); drop one of the flags")
    return ResNet(
        units=units,
        filters=filters,
        num_classes=cfg.data.num_classes,
        bottleneck=bottleneck,
        version=m.version,
        cardinality=m.cardinality if m.network == "resnext" else 1,
        group_width=m.group_width,
        cifar_stem=cifar,
        bn_mom=m.bn_mom,
        bn_eps=m.bn_eps,
        dtype=dtype if dtype is not None else _DTYPES[cfg.train.dtype],
        remat=cfg.train.remat if remat is None else remat,
        remat_policy=remat_policy,
        fused=fused,
        unit_chain=unit_chain,
        grouped_dense=grouped_dense,
        grouped_merge=grouped_merge,
        bn_subsample=bn_subsample,
        bn_grouped=bn_grouped,
        bn_stat_stride=bn_stat_stride,
        bn_ema=bn_ema,
        bn_ema_clamp=bn_ema_clamp,
        stem_s2d=stem_s2d,
        pool_grad=pool_grad,
        pallas_interpret=pallas_interpret,
    )
