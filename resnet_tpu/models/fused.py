"""Fused 1x1-conv+BN execution path for residual units.

Drop-in alternative execution of the ``nn.Conv(1x1) -> nn.BatchNorm``
pairs inside bottleneck units, backed by the Pallas matmul+stats kernel
(ops/fused_convbn.py). The param/variable tree is IDENTICAL to the
unfused modules (``<conv_name>/kernel``, ``<bn_name>/{scale,bias}``,
batch_stats ``<bn_name>/{mean,var}``), so checkpoints are interchangeable
and the flag is purely an execution-path switch.

Only used in training mode on TPU; eval and non-1x1 convs take the
standard XLA path (XLA already fuses the running-average normalize into
consumers).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from resnet_tpu.models.resnet import conv_init
from resnet_tpu.ops.fused_convbn import conv1x1_bn_stats


class _ConvKernel(nn.Module):
    """Param shell matching nn.Conv's tree: defines only `kernel`."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        # explicit f32 param dtype, matching nn.Conv's default param_dtype
        # (initializers otherwise follow jax_enable_x64's default float)
        return self.param("kernel", conv_init,
                          (1, 1, in_features, self.features), jnp.float32)


class _BNState(nn.Module):
    """Param/variable shell matching nn.BatchNorm's tree; applies the
    affine normalize with externally supplied batch statistics and
    maintains the running-average EMA (momentum semantics identical to
    flax/MXNet: ra = m*ra + (1-m)*batch)."""
    momentum: float
    epsilon: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, y, batch_mean, batch_var, use_running_average: bool):
        feat = y.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (feat,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (feat,),
                               jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        acc = jnp.promote_types(self.dtype, jnp.float32)
        inv = jax.lax.rsqrt(var.astype(acc) + self.epsilon) \
            * scale.astype(acc)
        out = (y.astype(acc) - mean.astype(acc)) * inv + bias.astype(acc)
        return out.astype(self.dtype)


def fused_conv_bn(x, features: int, strides: Tuple[int, int],
                  conv_name: str, bn_name: str, *, train: bool,
                  relu: bool, bn_mom: float, bn_eps: float, dtype,
                  interpret: bool = False):
    """1x1 conv + BN (+ReLU), stats fused into the conv's MXU pass.

    Must be invoked inside the parent module's compact __call__ so the
    shells bind into the parent's scope under conv_name/bn_name.
    """
    n, h, w, cin = x.shape
    kernel = _ConvKernel(features=features, name=conv_name)(cin)
    k2d = kernel.reshape(cin, features).astype(dtype)
    if strides != (1, 1):
        # strided 1x1 conv == spatial subsample + matmul
        x = x[:, ::strides[0], ::strides[1], :]
        n, h, w, cin = x.shape
    x2d = x.reshape(n * h * w, cin).astype(dtype)

    bn = _BNState(momentum=bn_mom, epsilon=bn_eps, dtype=dtype,
                  name=bn_name)
    if train:
        y2d, mean, var = conv1x1_bn_stats(x2d, k2d, interpret)
        out = bn(y2d, mean, var, use_running_average=False)
    else:
        y2d = jax.lax.dot_general(
            x2d, k2d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        out = bn(y2d, None, None, use_running_average=True)
    out = out.reshape(n, h, w, features)
    return nn.relu(out) if relu else out
