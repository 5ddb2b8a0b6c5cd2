"""ResNet / ResNeXt model family, TPU-first (NHWC, bf16-ready, XLA-fusible).

Rebuilds the reference graph builders (ref:symbol/resnet.py,
ref:symbol/resnext.py — MXNet symbols made of Convolution/BatchNorm/
Activation/Pooling/FullyConnected) as Flax modules:

  - ``residual unit``: basic (two 3x3) and bottleneck (1x1-3x3-1x1) blocks in
    both v1 (post-activation: conv-BN-ReLU, add, ReLU) and v2 (pre-activation:
    BN-ReLU-conv, add) flavors; optional cardinality (grouped 3x3) gives
    ResNeXt. Mirrors ``residual_unit(data, num_filter, stride, dim_match,
    bottle_neck, num_group)`` in the reference.
  - depth tables: 18/34/50/101/152/200/269 with the reference's unit counts
    and filter lists; CIFAR 6n+2 / 9n+2 three-stage variants.
  - stems: ImageNet (7x7/2 conv + 3x3/2 maxpool) and CIFAR (3x3/1 conv).

TPU-first design choices (deliberate departures from the CUDA/NCHW reference):
  - NHWC layout throughout — XLA:TPU's native conv layout; the MXU tiles the
    channel dim (last, 128-lane) directly.
  - stride lives on the 3x3 conv of the bottleneck (not the first 1x1), which
    avoids strided 1x1 convs that waste MXU occupancy.
  - compute dtype is a parameter (bf16 for the MXU), params/BN stats stay fp32
    (flax computes BN statistics in fp32 regardless of compute dtype).
  - ``remat`` wraps each residual unit in jax.checkpoint — the equivalent of
    the reference's memonger ``mirror_stage`` sublinear-memory plan
    (ref:core/memonger.py).

Weight init is MSRA (He): variance_scaling(2.0, fan_in, normal), matching the
reference's ``Xavier(rnd_type='gaussian', factor_type='in', magnitude=2)``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# MSRA initialization (ref:train_resnet.py init Xavier(gaussian, in, 2))
conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
dense_init = nn.initializers.variance_scaling(1.0, "fan_in", "normal")

# Depth → per-stage unit counts (ref:symbol/resnet.py depth table)
IMAGENET_UNITS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
    200: (3, 24, 36, 3),
    269: (3, 30, 48, 8),
}
# bottleneck for depth >= 50 (ref:symbol/resnet.py bottle_neck flag)
BOTTLENECK_MIN_DEPTH = 50

# Filter lists (ref:symbol/resnet.py filter_list)
FILTERS_BOTTLENECK = (64, 256, 512, 1024, 2048)
FILTERS_BASIC = (64, 64, 128, 256, 512)
CIFAR_FILTERS_BASIC = (16, 16, 32, 64)
CIFAR_FILTERS_BOTTLENECK = (16, 64, 128, 256)


class _Conv1x1Dot(nn.Module):
    """1x1 conv lowered as a reshaped matmul (XLA `dot`).

    XLA:TPU fuses elementwise producers/consumers and column reductions
    around `dot` ops more aggressively than around `convolution` ops
    (measured: an XLA normalize+relu+dot+stats chain hits the same
    time as a hand-fused Pallas kernel — PERF_NOTES.md). Param tree is
    identical to nn.Conv (kernel (1,1,Cin,Cout)), so checkpoints
    interchange. Strided 1x1 == spatial subsample + matmul.
    """
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", conv_init,
                            (1, 1, cin, self.features))
        if self.strides != (1, 1):
            x = x[:, ::self.strides[0], ::self.strides[1], :]
        n, h, w, _ = x.shape
        # output in compute dtype (the MXU accumulates f32 internally),
        # exactly like nn.Conv(dtype=...) — a preferred f32 output here
        # materializes f32 activations and OOMs at batch 256
        y = jax.lax.dot_general(
            x.reshape(n * h * w, cin).astype(self.dtype),
            kernel.reshape(cin, self.features).astype(self.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())))
        return y.reshape(n, h, w, self.features)


class _StemConvS2D(nn.Module):
    """7x7/2 stem conv lowered in space-to-depth form (exact reindexing).

    The ImageNet stem (7x7 stride-2 conv on a 3-channel input,
    ref:symbol/resnet.py conv0) is the one conv in the family that is
    MXU-hostile by shape: 3 input channels fill 3 of 128 MXU lanes and
    the stride-2 patch walk defeats input reuse. Re-indexing input and
    kernel into 2x2 space-to-depth blocks turns the SAME contraction
    into a 4x4 stride-1 conv over an (H/2, W/2, 4C) input — 4x the lane
    occupancy and a dense walk (the standard TPU lowering of the ResNet
    stem, e.g. the public MLPerf TPU submissions). Execution switch
    only: the parameter stays the reference-shaped (7,7,C,F) kernel
    (checkpoints/export interchange), transformed in-graph — zero-pad to
    8x8 at the leading edge (row -1 = the out-of-image tap stride 2
    never uses on the left), regroup into 2x2 blocks — with the exact
    transpose as its VJP. Index map: original tap di = 2*b + p - 1 for
    block offset b and within-block phase p, so original padding 3
    becomes block padding (2, 1). Numerically identical to nn.Conv up
    to float reassociation (f64 oracle: tests/test_stem_s2d.py).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pre_blocked: bool = False):
        """``pre_blocked``: the input is ALREADY in (N, H/2, W/2, 4C)
        space-to-depth block layout, channel order (py, px, c) — the
        round-4 ``aug_s2d`` path, where the on-device augmenter emits
        blocks directly and the stem's regroup copies disappear. The
        parameter stays the reference-shaped (7,7,C,F) kernel either way.
        """
        if pre_blocked:
            n, h2, w2, c4 = x.shape
            c = c4 // 4
        else:
            n, h, w, c = x.shape
        kernel = self.param("kernel", conv_init, (7, 7, c, self.features))
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = (k.reshape(4, 2, 4, 2, c, self.features)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * c, self.features))
        if not pre_blocked:
            x = (x.reshape(n, h // 2, 2, w // 2, 2, c)
                  .transpose(0, 1, 3, 2, 4, 5)
                  .reshape(n, h // 2, w // 2, 4 * c))
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _GroupedConvDense(nn.Module):
    """Grouped conv lowered with ``merge`` groups fused per dense block.

    Cardinality-G grouped convs (ResNeXt's 3x3, ref:symbol/resnext.py
    num_group) feed the MXU Cmid/G channels per group — at G=32 that is 4
    of 128 lanes (measured: ResNeXt-50 at ~1570 img/s vs ResNet-50's
    2549, PERF_NOTES.md). Fusing ``merge`` adjacent groups into one
    block-diagonal dense block trades merge-fold redundant FLOPs for
    merge*width MXU lanes; ``merge=G`` is the fully dense lowering
    (measured: full merge LOSES — 32x FLOPs stops being free — so the
    sweet spot, if any, is a partial merge). The zeros are structural —
    gradients flow only to the real (kh, kw, Cin/G, Cout) parameter,
    whose tree is IDENTICAL to nn.Conv(feature_group_count=G), so
    checkpoints interchange and this is purely an execution switch.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    groups: int
    merge: int = 0                 # groups fused per block; 0/G = dense
    padding: Any = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        g = self.groups
        f = self.merge or g
        assert g % f == 0, (g, f)
        go = g // f                     # outer (true) groups after merge
        cg, cog = cin // g, self.features // g
        kh, kw = self.kernel_size
        k = self.param("kernel", conv_init, (kh, kw, cg, self.features),
                       jnp.float32)
        # k6[h,w,c,j,m,o]: inner group m of outer group j (channel layout
        # is contiguous per original group index jf+m)
        k6 = k.reshape(kh, kw, cg, go, f, cog)
        # block-diagonal within each outer group: input slot n == inner
        # group m, else zero
        dense = jnp.einsum("hwcjmo,nm->hwncjmo", k6,
                           jnp.eye(f, dtype=k.dtype))
        # lax grouped-conv kernel layout: (kh, kw, Cin/go, features) with
        # per-group input dims ordered (n, c) and outputs ordered (j, m, o)
        # — the einsum output axes (h,w,n,c,j,m,o) are already in that
        # order, so a straight reshape flattens correctly
        dense = dense.reshape(kh, kw, f * cg, self.features)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            feature_group_count=go,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_or_dot(features, kernel_size, strides=(1, 1), dtype=jnp.float32,
                 name=None, padding="SAME", feature_group_count=1):
    """nn.Conv drop-in that routes unit-kernel convs through _Conv1x1Dot."""
    if tuple(kernel_size) == (1, 1) and feature_group_count == 1:
        return _Conv1x1Dot(features=features, strides=tuple(strides),
                           dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides, padding=padding,
                   feature_group_count=feature_group_count, use_bias=False,
                   kernel_init=conv_init, dtype=dtype, name=name)


def _norm(mom: float, eps: float, dtype, name: str, use_scale: bool = True,
          subsample: int = 1, tag_stats: bool = False,
          grouped: bool = False, stat_stride: int = 1,
          ema_normalize: bool = False, ema_clamp: float = 1.0):
    """BatchNorm matching MXNet semantics: momentum 0.9 EMA on running stats.

    MXNet ``BatchNorm(momentum=m)`` updates ``moving = m*moving + (1-m)*batch``
    — identical to flax's convention. ``use_scale=False`` emulates the
    reference's ``fix_gamma=True``. ``subsample > 1`` computes batch
    statistics over a leading sub-batch (SubsampleBatchNorm), or — with
    ``grouped`` — normalizes ``subsample`` independent sub-batches each with
    its own statistics (the exact single-chip analog of the reference's
    per-GPU BatchNorm; see SubsampleBatchNorm). ``stat_stride > 1`` samples
    the train-mode statistics from every s-th spatial row/column of ALL
    images (1/s² of the stats-sweep HBM traffic; see SubsampleBatchNorm).
    ``tag_stats`` marks the batch
    stats as remat-saveable (``bn_stats`` checkpoint name) so a
    selective-remat policy keeps the tiny per-channel reductions instead of
    re-running full-activation sweeps in backward.
    """
    if subsample > 1 or tag_stats or stat_stride > 1 or ema_normalize:
        return partial(
            SubsampleBatchNorm, momentum=mom, epsilon=eps, dtype=dtype,
            use_scale=use_scale, subsample=subsample, tag_stats=tag_stats,
            grouped=grouped, stat_stride=stat_stride,
            ema_normalize=ema_normalize, ema_clamp=ema_clamp, name=name)
    return partial(
        nn.BatchNorm, momentum=mom, epsilon=eps, dtype=dtype,
        use_scale=use_scale, name=name)


class SubsampleBatchNorm(nn.Module):
    """BatchNorm with sub-batch train-mode statistics, in two flavors.

    Background: the reference's BatchNorm is per-GPU — kvstore 'device'
    splits the global batch over the GPUs, so each BN layer's statistics
    come from a (e.g.) 32-image sub-batch of the 256-image global batch
    (SURVEY.md §7 hard-part 3, mxnet:src/operator/nn/batch_norm per-device
    semantics). On one chip:

    - ``grouped=False`` (bnsub): statistics from the FIRST ``batch //
      subsample`` images, applied to the whole batch. This matches the
      reference's statistics *sample count* (32 images at bs256, s=8) but
      NOT its grouping semantics — all images share one sub-batch's stats.
      It reads 1/subsample of the activation bytes in the stats reduce
      (the fwd BN sweeps were ~16 ms/step of R50 HBM traffic,
      PERF_NOTES.md), which is why it is the fastest mode.
    - ``grouped=True`` (per-GPU parity): the batch is split into
      ``subsample`` contiguous groups and EACH group is normalized with
      its own statistics — bitwise the semantics of running the model
      data-parallel over ``subsample`` devices with per-replica BN
      (verified against an 8-device shard_map run in
      tests/test_bn_subsample.py). The EMA is updated with the mean of
      the group statistics, which equals the average of per-device EMAs
      the reference materializes at get_params time.
    - ``stat_stride=s`` (spatial subsampling, round 3): train-mode
      statistics come from every s-th spatial row AND column of ALL
      images (``x[:, ::s, ::s]``). Unlike bnsub (which reads a biased
      32-image subset and FAILS the convergence bar — PERF_NOTES.md
      round 3), this keeps every image in the sample and only thins the
      spatially-correlated pixels, and it PASSES the convergence bar
      and carries a golden-trajectory pin. It is nonetheless a MEASURED
      NEGATIVE RESULT for throughput (PERF_NOTES.md round 3b): the
      hypothesis was 1/s² stats-sweep HBM traffic, but on the TPU's
      (8,128)-tiled layout the sublane-strided slice does not fuse into
      the reduce — XLA materializes a re-tiling copy of the slice, so
      R50 bs256 measured 2045 img/s (s=2) / 2431 (s=4) vs 2475
      full-batch. Kept as an off-default knob with oracle + golden
      coverage. Composes with ``subsample``/``grouped`` (stride applies
      inside the stats slice; grouped+stride measured 936 — worse).

    - ``ema_normalize=True`` (bn-ema, round 3c): the structural-traffic
      mode — kill the VARIANCE path's backward sweep, keep everything
      that convergence measurably needs. Train-mode normalization uses
      the live batch mean (gradient-carrying: its VJP re-uses the
      sum-of-gy reduce dbeta computes anyway and fuses into the conv
      backward) and a STOP-GRADIENT variance clipped to the
      ``ema_clamp`` trust region around the live batch variance
      (``ema_clamp=1.0``, the shipped value, pins it to the batch
      evidence exactly). Dropping the variance gradient removes the
      ``mean(gy * x_hat)`` correction from the input gradient — the
      backward pass that re-reads the activations — so the BN backward
      collapses into the conv backward's elementwise epilogue. The lost
      scale-feedback (BN's implicit radial gradient projection) is
      reinstated in weight space by ``train/optim.radial_projection``;
      without it this mode DIVERGES (pinned counter-evidence in
      tests/test_convergence_record.py). The EMA refresh runs from a
      stop-gradient leading-``batch // subsample`` sweep; ``subsample=1``
      (shipped) measured FASTER than 8 — the sliced reduce breaks the
      producing conv's fusion — and keeps the eval-stats stream
      identical to full-batch BN's. Needs primed stats + settled early
      dynamics: the Solver runs ``bn_ema_warmup`` steps (negative =
      epochs; shipped -2) of true batch-stats BN before the host-side
      program switch. The dynamics ladder is measured in PERF_NOTES.md
      (pure frozen stats: NaN; + clamp: runaway at the trust boundary;
      + projection: stable but CE-inflated; + live mean slack=0: bar at
      0.67; + mean gradient: bar at 1.0).

    Eval semantics are identical to nn.BatchNorm in all flavors, and the
    param/variable tree is identical (checkpoints interchange).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    use_scale: bool = True
    subsample: int = 8
    grouped: bool = False
    stat_stride: int = 1
    ema_normalize: bool = False
    ema_clamp: float = 1.0    # trust region (σ-ratio / σ-units) vs the
                              # subsample evidence; 0 disables
    tag_stats: bool = False   # checkpoint_name the batch stats "bn_stats"

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (feat,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (feat,),
                               jnp.float32)
        scale = (self.param("scale", nn.initializers.ones, (feat,),
                            jnp.float32) if self.use_scale else None)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)

        def _tag(m, v):
            if self.tag_stats:
                from jax.ad_checkpoint import checkpoint_name
                return (checkpoint_name(m, "bn_stats"),
                        checkpoint_name(v, "bn_stats"))
            return m, v

        def _ema(mean, var):
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var

        def _stat_slice(t):
            # every stat_stride-th spatial row/column; spatial dims are the
            # two before the channel dim (NHWC / grouped gNHWC)
            s = self.stat_stride
            if s <= 1 or t.ndim < 4:
                return t
            sl = ((slice(None),) * (t.ndim - 3)
                  + (slice(None, None, s),) * 2 + (slice(None),))
            return t[sl]

        if not use_running_average and self.grouped and self.subsample > 1:
            n = x.shape[0]
            g = min(self.subsample, n)
            if n % g:
                raise ValueError(
                    f"grouped BN: batch {n} not divisible by {g} groups")
            xs = x.astype(jnp.float32).reshape(g, n // g, *x.shape[1:])
            ss = _stat_slice(xs)
            red = tuple(range(1, xs.ndim - 1))
            gmean = jnp.mean(ss, axis=red)                      # (g, C)
            # clamp: E[x^2]-mean^2 can go negative by float cancellation
            # (small groups make it likelier) — same guard as flax
            gvar = jnp.maximum(
                0.0, jnp.mean(ss * ss, axis=red) - gmean * gmean)
            gmean, gvar = _tag(gmean, gvar)
            _ema(jnp.mean(gmean, 0), jnp.mean(gvar, 0))
            inv = jax.lax.rsqrt(gvar + self.epsilon)
            if scale is not None:
                inv = inv * scale
            bshape = (g,) + (1,) * (xs.ndim - 2) + (feat,)
            out = (xs - gmean.reshape(bshape)) * inv.reshape(bshape) + bias
            return out.reshape(x.shape).astype(self.dtype)

        if not use_running_average and self.ema_normalize:
            # read the running stats BEFORE the refresh mutates them (pre-
            # refresh values feed the trust region, so a resumed step
            # replays identically); at ema_clamp=1.0 the clip collapses
            # them onto the live batch evidence entirely
            mean = jax.lax.stop_gradient(ra_mean.value)
            var = jax.lax.stop_gradient(ra_var.value)
            k = max(1, x.shape[0] // self.subsample)
            # the batch mean keeps its GRADIENT (mean_grad below): its VJP
            # only re-uses the sum-of-gy reduce that dbeta computes anyway
            # and fuses into the conv backward as a broadcast subtract —
            # unlike the variance VJP, which would re-read the activations.
            # Shift-feedback (gy centering) comes back for free; the
            # scale-feedback is restored in weight space by the optimizer's
            # radial projection (train/optim.py radial_projection).
            bmean_g = jnp.mean(
                _stat_slice(x[:k]).astype(jnp.float32),
                axis=tuple(range(x.ndim - 1)))
            bmean = jax.lax.stop_gradient(bmean_g)
            xs = jax.lax.stop_gradient(
                _stat_slice(x[:k]).astype(jnp.float32))
            bvar = jnp.maximum(
                0.0, jnp.mean(
                    xs * xs, axis=tuple(range(xs.ndim - 1)))
                - bmean * bmean)
            if self.ema_clamp > 0:
                # Batch-Renorm-style trust region (Ioffe 2017 rmax/dmax,
                # applied in stats space with FULL stop-gradient): clamp
                # the running stats against the current subsample's
                # evidence, which is already in hand for the EMA refresh
                # — zero extra HBM traffic. When activation statistics
                # drift fast (early training, LR steps) the raw EMA lags
                # and under-normalizes; across ~50 BN layers that
                # mismatch compounds into divergence (measured: NaN 2
                # steps after an unclamped switch). In steady state
                # var_r/bvar ≈ 1 and the clamp is inactive — exact
                # running-stats semantics, train == eval normalize.
                c2 = self.ema_clamp * self.ema_clamp
                var = jnp.clip(var, bvar / c2, bvar * c2 + self.epsilon)
                # mean slack (clamp-1)*sigma so the knob is consistent at
                # its tight end: clamp=1.0 pins BOTH stats to the live
                # batch evidence. The first formulation allowed +-1*sigma
                # of mean lag at clamp=1 — measured: a persistent
                # post-switch CE inflation (1.6 -> 4-8) as every BN layer
                # ran up to 1 sigma off-center into its ReLU while the
                # variance tracked exactly.
                sd = jnp.sqrt(bvar + self.epsilon) * (self.ema_clamp - 1.0)
                mean = jnp.clip(mean, bmean - sd, bmean + sd)
            _ema(bmean, bvar)
            inv = jax.lax.rsqrt(var + self.epsilon)
            if scale is not None:
                inv = inv * scale
            # normalize with mean = live batch mean (gradient-carrying)
            # plus the stop-gradient bounded EMA offset: at clamp=1 this
            # is exactly (x - bmean_g); at larger clamps the EMA offset
            # rides along as a constant within the trust region
            mean_n = bmean_g + jax.lax.stop_gradient(mean - bmean)
            out = (x.astype(jnp.float32) - mean_n) * inv + bias
            return out.astype(self.dtype)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            k = max(1, x.shape[0] // self.subsample)
            xs = _stat_slice(x[:k]).astype(jnp.float32)
            mean = jnp.mean(xs, axis=tuple(range(xs.ndim - 1)))
            var = jnp.maximum(
                0.0, jnp.mean(
                    xs * xs, axis=tuple(range(xs.ndim - 1))) - mean * mean)
            mean, var = _tag(mean, var)
            _ema(mean, var)
        inv = jax.lax.rsqrt(var + self.epsilon)
        if scale is not None:
            inv = inv * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype)


class ResidualUnit(nn.Module):
    """One residual unit (ref:symbol/resnet.py residual_unit / resnext.py).

    v1: conv-BN-ReLU chains, projection shortcut conv-BN, ReLU after the add.
    v2: pre-activation BN-ReLU-conv chains, shortcut taken from the first
        pre-activation, plain add (no trailing ReLU).
    ``cardinality > 1`` makes the middle 3x3 a grouped conv (ResNeXt);
    ``mid_filters`` then follows the reference's ``num_group * width`` rule.
    """

    filters: int                  # output channels of the unit
    strides: Tuple[int, int]
    dim_match: bool               # identity shortcut iff True
    bottleneck: bool
    version: int = 1
    cardinality: int = 1
    mid_filters: Optional[int] = None   # override middle width (ResNeXt)
    bn_mom: float = 0.9
    bn_eps: float = 2e-5
    dtype: Any = jnp.float32
    fused: bool = False           # Pallas conv1x1+BN-stats path (v1 only)
    unit_chain: str = "off"       # "off"|"xla"|"pallas": chain dataflow
    grouped_dense: bool = False   # grouped 3x3 as block-diagonal dense conv
    grouped_merge: int = 0        # groups fused per dense block (0 = all)
    bn_subsample: int = 1         # BN stats from batch//s leading images
    bn_grouped: bool = False      # s independent groups (per-GPU parity)
    bn_stat_stride: int = 1       # BN stats from every s-th spatial row/col
    bn_ema: bool = False          # normalize with running stats (stop-grad);
                                  # EMA refreshed from the subsample sweep
    bn_ema_clamp: float = 1.0     # trust region vs live batch evidence
    tag_remat: bool = False       # checkpoint_name conv outs / BN stats for
                                  # the selective-remat policy (ResNet below)
    pallas_interpret: bool = False
    conv1x1_as_dot: bool = False  # lower 1x1 convs as reshaped matmuls

    @nn.compact
    def __call__(self, x, train: bool):
        # Chain dataflow (models/chain.py): stats/normalize ride the 1x1
        # convs' MXU passes. Train-mode v1 bottleneck only; eval and other
        # unit shapes take the standard path (identical param tree).
        if (self.unit_chain != "off" and train and self.version == 1
                and self.bottleneck and self.cardinality == 1):
            from resnet_tpu.models.chain import chain_unit_v1
            return chain_unit_v1(
                x, filters=self.filters,
                mid=self.mid_filters or self.filters // 4,
                strides=self.strides, dim_match=self.dim_match,
                conv_init=conv_init, bn_mom=self.bn_mom,
                bn_eps=self.bn_eps, dtype=self.dtype,
                backend=self.unit_chain,
                interpret=self.pallas_interpret)
        raw_conv = partial(nn.Conv, use_bias=False, kernel_init=conv_init,
                           dtype=self.dtype)
        if self.conv1x1_as_dot:
            raw_conv = partial(_conv_or_dot, dtype=self.dtype)
        if self.tag_remat:
            from jax.ad_checkpoint import checkpoint_name
            tag = lambda y: checkpoint_name(y, "conv_out")
        else:
            tag = lambda y: y
        # conv(...)(x) -> tagged output: under the selective-remat policy
        # only these (+ BN stats) are saved; normalize/relu are recomputed
        conv = lambda *a, **kw: (lambda x_: tag(raw_conv(*a, **kw)(x_)))
        bn = lambda name, scale=True: _norm(
            self.bn_mom, self.bn_eps, self.dtype, name, scale,
            self.bn_subsample, self.tag_remat, self.bn_grouped,
            self.bn_stat_stride, self.bn_ema, self.bn_ema_clamp)()
        relu = nn.relu
        ra = not train

        if self.bottleneck:
            mid = self.mid_filters or self.filters // 4
        else:
            mid = self.filters

        def grouped3x3(y, strides):
            """The ResNeXt 3x3: grouped conv, or its block-diagonal dense
            lowering (--grouped-dense) — same `conv2/kernel` param tree."""
            if self.cardinality > 1 and self.grouped_dense:
                return tag(_GroupedConvDense(
                    features=mid, kernel_size=(3, 3), strides=strides,
                    groups=self.cardinality, merge=self.grouped_merge,
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y))
            return conv(mid, (3, 3), strides, padding=((1, 1), (1, 1)),
                        feature_group_count=self.cardinality,
                        name="conv2")(y)

        if self.version == 2:
            # Pre-activation (He et al. 2016, Identity Mappings).
            pre = relu(bn("bn1")(x, use_running_average=ra))
            shortcut = x if self.dim_match else conv(
                self.filters, (1, 1), self.strides, name="sc")(pre)
            if self.bottleneck:
                y = conv(mid, (1, 1), (1, 1), name="conv1")(pre)
                y = relu(bn("bn2")(y, use_running_average=ra))
                y = grouped3x3(y, self.strides)
                y = relu(bn("bn3")(y, use_running_average=ra))
                y = conv(self.filters, (1, 1), (1, 1), name="conv3")(y)
            else:
                y = conv(mid, (3, 3), self.strides, padding=((1, 1), (1, 1)),
                         name="conv1")(pre)
                y = relu(bn("bn2")(y, use_running_average=ra))
                y = conv(self.filters, (3, 3), (1, 1),
                         padding=((1, 1), (1, 1)), name="conv2")(y)
            return y + shortcut

        # v1: post-activation
        use_fused = (self.fused and self.bottleneck
                     and self.cardinality == 1)
        if use_fused:
            # Pallas path: BN statistics fused into the 1x1 convs' MXU
            # pass (see ops/fused_convbn.py). Param tree identical.
            from resnet_tpu.models.fused import fused_conv_bn
            fkw = dict(train=train, bn_mom=self.bn_mom, bn_eps=self.bn_eps,
                       dtype=self.dtype, interpret=self.pallas_interpret)
            shortcut = x
            if not self.dim_match:
                shortcut = fused_conv_bn(
                    x, self.filters, self.strides, "sc", "sc_bn",
                    relu=False, **fkw)
            y = fused_conv_bn(x, mid, (1, 1), "conv1", "bn1", relu=True,
                              **fkw)
            y = conv(mid, (3, 3), self.strides, padding=((1, 1), (1, 1)),
                     name="conv2")(y)
            y = relu(bn("bn2")(y, use_running_average=ra))
            y = fused_conv_bn(y, self.filters, (1, 1), "conv3", "bn3",
                              relu=False, **fkw)
            return relu(y + shortcut)

        shortcut = x
        if not self.dim_match:
            shortcut = conv(self.filters, (1, 1), self.strides, name="sc")(x)
            shortcut = bn("sc_bn")(shortcut, use_running_average=ra)
        if self.bottleneck:
            y = conv(mid, (1, 1), (1, 1), name="conv1")(x)
            y = relu(bn("bn1")(y, use_running_average=ra))
            y = grouped3x3(y, self.strides)
            y = relu(bn("bn2")(y, use_running_average=ra))
            y = conv(self.filters, (1, 1), (1, 1), name="conv3")(y)
            y = bn("bn3")(y, use_running_average=ra)
        else:
            y = conv(mid, (3, 3), self.strides, padding=((1, 1), (1, 1)),
                     name="conv1")(x)
            y = relu(bn("bn1")(y, use_running_average=ra))
            y = conv(self.filters, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                     name="conv2")(y)
            y = bn("bn2")(y, use_running_average=ra)
        return relu(y + shortcut)


class ResNet(nn.Module):
    """Full network (ref:symbol/resnet.py ``resnet(units, num_stages, ...)``).

    stem → num_stages stages of residual units (stride 2 at each stage
    entry except the first... CIFAR/ImageNet rules below) → BN-ReLU (v2) →
    global average pool → FC → logits. Loss/softmax live in the train step
    (the reference fuses them in ``SoftmaxOutput``).
    """

    units: Sequence[int]
    filters: Sequence[int]          # [stem] + per-stage output channels
    num_classes: int
    bottleneck: bool
    version: int = 1
    cardinality: int = 1
    group_width: int = 4
    cifar_stem: bool = False
    bn_mom: float = 0.9
    bn_eps: float = 2e-5
    dtype: Any = jnp.float32
    remat: bool = False
    remat_policy: str = "none"    # "none" | "conv": selective remat — save
                                  # conv outputs + BN batch stats, recompute
                                  # normalize/relu in backward (cuts the
                                  # double-saved activation set; see
                                  # PERF_NOTES.md)
    fused: bool = False           # Pallas conv1x1+BN-stats path (v1 only)
    unit_chain: str = "off"       # "off"|"xla"|"pallas": chain dataflow
    grouped_dense: bool = False   # grouped 3x3 as block-diagonal dense conv
    grouped_merge: int = 0        # groups fused per dense block (0 = all)
    bn_subsample: int = 1         # BN stats from batch//s leading images
    bn_grouped: bool = False      # s independent groups (per-GPU parity)
    bn_stat_stride: int = 1       # BN stats from every s-th spatial row/col
    bn_ema: bool = False          # normalize with running stats (stop-grad)
    bn_ema_clamp: float = 1.0     # trust region vs live batch evidence
    stem_s2d: bool = False        # 7x7/2 stem as a space-to-depth 4x4/1
                                  # conv (exact reindex; _StemConvS2D)
    pool_grad: str = "sas"        # stem maxpool backward: "sas" | "mask"
                                  # (ops/pool.py tie-splitting VJP)
    pallas_interpret: bool = False
    conv1x1_as_dot: bool = False  # lower 1x1 convs as reshaped matmuls

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, kernel_init=conv_init,
                       dtype=self.dtype)
        bn = lambda name, scale=True: _norm(
            self.bn_mom, self.bn_eps, self.dtype, name, scale,
            self.bn_subsample, grouped=self.bn_grouped,
            stat_stride=self.bn_stat_stride, ema_normalize=self.bn_ema,
            ema_clamp=self.bn_ema_clamp)()
        ra = not train

        x = x.astype(self.dtype)
        if self.version == 2:
            # ref:symbol/resnet.py: leading fixed-gamma BN on raw data
            x = bn("bn_data", scale=False)(x, use_running_average=ra)

        if self.cifar_stem:
            x = conv(self.filters[0], (3, 3), (1, 1),
                     padding=((1, 1), (1, 1)), name="conv0")(x)
            if self.version == 1:
                x = nn.relu(bn("bn0")(x, use_running_average=ra))
        else:
            # aug_s2d contract: a 12-channel input is the augmenter's
            # space-to-depth block output (RGB models only ship c=3, so
            # the shape is unambiguous); requires stem_s2d
            pre_blocked = x.shape[-1] == 12
            if pre_blocked and not self.stem_s2d:
                raise ValueError(
                    "pre-blocked (12-channel) stem input needs stem_s2d")
            if self.stem_s2d and (pre_blocked or (
                    x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)):
                x = _StemConvS2D(self.filters[0], dtype=self.dtype,
                                 name="conv0")(x, pre_blocked=pre_blocked)
            else:
                x = conv(self.filters[0], (7, 7), (2, 2),
                         padding=((3, 3), (3, 3)), name="conv0")(x)
            x = nn.relu(bn("bn0")(x, use_running_average=ra))
            from resnet_tpu.ops.pool import stem_max_pool
            x = stem_max_pool(x, self.pool_grad)

        unit_cls = ResidualUnit
        tag_remat = self.remat_policy == "conv" and not self.remat
        if self.remat:
            # memonger parity: recompute unit activations in backward
            # (ref:core/memonger.py mirror_stage). static_argnums marks the
            # `train` python bool.
            unit_cls = nn.remat(ResidualUnit, static_argnums=(2,))
        elif tag_remat:
            # selective remat: keep conv outputs + per-channel BN stats,
            # recompute the elementwise normalize/relu chain in backward —
            # the fwd then materializes ONE tensor set per unit instead of
            # two (conv outs AND post-activation residuals)
            unit_cls = nn.remat(
                ResidualUnit, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"))

        for stage, (n_units, n_filter) in enumerate(
                zip(self.units, self.filters[1:])):
            for unit in range(n_units):
                first = unit == 0
                # first stage keeps stride 1 (stem already downsampled /
                # CIFAR starts at full res)
                stride = (2, 2) if (first and stage > 0) else (1, 1)
                mid = None
                if self.cardinality > 1 and self.bottleneck:
                    # ResNeXt width rule (ref:symbol/resnext.py):
                    # mid = num_group * group_width at stage0, doubling —
                    # i.e. filters * C * w / 256 for the standard tables.
                    mid = max(
                        n_filter * self.cardinality * self.group_width // 256,
                        self.cardinality)
                # Reference convention (ref:symbol/resnet.py): the FIRST unit
                # of every stage uses a projection shortcut (dim_match=False),
                # even when shapes happen to match (stage 1 of basic nets).
                x = unit_cls(
                    filters=n_filter, strides=stride,
                    dim_match=not first,
                    bottleneck=self.bottleneck, version=self.version,
                    cardinality=self.cardinality if self.bottleneck else 1,
                    mid_filters=mid, bn_mom=self.bn_mom, bn_eps=self.bn_eps,
                    dtype=self.dtype,
                    fused=self.fused and self.version == 1,
                    unit_chain=self.unit_chain,
                    grouped_dense=self.grouped_dense,
                    grouped_merge=self.grouped_merge,
                    bn_subsample=self.bn_subsample,
                    bn_grouped=self.bn_grouped,
                    bn_stat_stride=self.bn_stat_stride,
                    bn_ema=self.bn_ema,
                    bn_ema_clamp=self.bn_ema_clamp,
                    tag_remat=tag_remat,
                    pallas_interpret=self.pallas_interpret,
                    conv1x1_as_dot=self.conv1x1_as_dot,
                    name=f"stage{stage + 1}_unit{unit + 1}",
                )(x, train)

        if self.version == 2:
            x = nn.relu(bn("bn_final")(x, use_running_average=ra))

        # global average pool (ref: Pooling(global_pool=True, kind='avg'))
        x = jnp.mean(x, axis=(1, 2))
        x = x.astype(jnp.float32)  # classifier head + loss in fp32
        x = nn.Dense(self.num_classes, kernel_init=dense_init, name="fc")(x)
        return x
