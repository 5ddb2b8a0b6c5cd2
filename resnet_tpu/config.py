"""Configuration system: typed dataclass config + train_imagenet-style CLI.

Rebuilds the reference's config surface (ref:config/cfgs.py — an easydict of
dataset/model/train/augmentation knobs) and its CLI flag names
(``--network --depth --batch-size --lr --lr-steps ...``), mapped to TPU
concepts where the GPU concept has no counterpart:

  - ``--gpus 0,1,...``      → ``--num-devices N`` (devices on the JAX mesh)
  - ``--kv-store device``   → ``--dp-mode {jit,shard_map}`` (GSPMD vs explicit psum)
  - ``--memonger``          → ``--remat`` (jax.checkpoint per residual stage)
  - fp16 ``multi_precision``→ ``--dtype bf16`` (fp32 master params + bf16 compute)
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass
class DataConfig:
    """Dataset + input pipeline knobs (ref: mx.io.ImageRecordIter kwargs)."""

    data_dir: str = "data"
    train_rec: str = "train.rec"
    train_idx: str = "train.idx"
    val_rec: str = "val.rec"
    val_idx: str = "val.idx"
    num_classes: int = 1000
    num_examples: int = 1281167
    image_shape: tuple = (224, 224, 3)  # NHWC (reference is '3,224,224' NCHW)
    # Augmentation (parity-critical set, ref: mxnet src/io/image_aug_default.cc
    # sampling rules; defaults mirror the reference family's ImageNet cfgs)
    rand_crop: bool = True
    rand_mirror: bool = True
    random_resized_crop: bool = True  # area-based RRC vs classic scale crop
    min_random_area: float = 0.08     # random-resized-crop area range
    max_random_area: float = 1.0
    # MXNet aspect convention: ratio ~ U[1-a, 1+a] for a <= 1 (the
    # reference cfgs use 0.25); a > 1 is accepted as the multiplicative
    # [1/a, a] convention; min_aspect_ratio overrides the lower bound.
    max_aspect_ratio: float = 0.25
    min_aspect_ratio: Optional[float] = None
    # classic (random_resized_crop=False) path: shorter side resized to
    # data_shape * s with s ~ U[min_random_scale, max_random_scale]
    min_random_scale: float = 1.0
    max_random_scale: float = 1.0
    max_rotate_angle: float = 0.0     # degrees, uniform in [-a, a]
    max_shear_ratio: float = 0.0      # horizontal shear, uniform in [-s, s]
    # Where the rotate/shear warp runs when enabled: 'host' warps canvases
    # in the record-pipeline decode stage (the reference's placement —
    # warpAffine lives in its CPU augmenter threads — and the TPU answer:
    # the non-separable warp lowers to a gather on-device and costs 11x
    # the train step, PERF_NOTES.md round 3); 'device' keeps the in-graph
    # bilinear-gather path (also used by non-record pipelines, which have
    # no host decode stage). Geometry is identical either way
    # (data/host_warp.py parity pin).
    rotate_backend: str = "host"
    random_h: int = 36                # HSL jitter ranges (reference ImageNet
    random_s: int = 50                # cfgs: 36/50/50 in OpenCV HLS units)
    random_l: int = 50
    mean_rgb: tuple = (123.68, 116.779, 103.939)
    std_rgb: tuple = (58.393, 57.12, 57.375)
    # Normalize-stage photometric jitters of mx.io.ImageRecordIter
    # (ref: mxnet src/io/iter_image_recordio_2.cc folds them into the
    # per-image RGBA_MULT/RGBA_BIAS normalize constants — reconstructed,
    # mount empty): contrast alpha ~ U[1-c, 1+c] scales the
    # mean-subtracted pixel, illumination beta ~ U[-il, il] adds in raw
    # pixel units, both before the /std. The reference ImageNet cfgs
    # leave them 0 (off), matching these defaults.
    max_random_contrast: float = 0.0
    max_random_illumination: float = 0.0
    # Classic pad-and-crop knobs of ImageRecordIter (``pad``,
    # ``fill_value``), used by the CIFAR path: pad pixels on every side
    # (constant fill) before the random data_shape crop. Defaults = the
    # classic CIFAR recipe (pad 4, zero fill); NOTE mx.io.ImageRecordIter's
    # own defaults differ (pad=0, fill_value=255) — set both explicitly for
    # bit-faithful reference reproduction of a non-default pad recipe.
    pad: int = 4
    fill_value: int = 0
    preprocess_threads: int = 4
    prefetch_buffer: int = 2
    # Train-canvas size (0 = auto: 8/7 of the output, e.g. 256 for 224).
    # The host loader letterboxes each decoded image onto a square
    # canvas_size x canvas_size uint8 canvas and the on-device augmenter
    # crops from THAT, so a random crop of a source larger than the canvas
    # is double-resampled (orig -> canvas -> 224). The reference's CPU
    # augmenter crops the full decoded image instead
    # (mxnet:src/io/image_aug_default.cc). For shorter-side-256 packs (the
    # standard recipe; im2rec --resize 256) the deviation is small; raise
    # this (288/320) to shrink it at a measured H2D/aug throughput cost
    # (PERF_NOTES.md canvas sweep).
    canvas_size: int = 0
    shuffle: bool = True
    # Pipeline selection: 'synthetic' | 'memory' | 'record'
    pipeline: str = "record"
    # Augmentation backend: 'auto' (Pallas on TPU when supported) |
    # 'xla' | 'pallas' | 'pallas-split' (the pre-round-4 split
    # photometric kernel — f32 intermediate + XLA HSL; A/B comparison)
    augment_impl: str = "auto"


@dataclass
class ModelConfig:
    """Network selection (ref:symbol/resnet.py get_symbol arguments)."""

    network: str = "resnet"           # resnet | resnext
    depth: int = 50
    version: int = 1                  # residual unit v1 (post-act) or v2 (pre-act)
    cardinality: int = 32             # ResNeXt num_group
    group_width: int = 4              # ResNeXt bottleneck width per group
    bn_mom: float = 0.9
    bn_eps: float = 2e-5
    dataset: str = "imagenet"         # imagenet | cifar10  (selects stem + stages)


@dataclass
class TrainConfig:
    """Optimizer / schedule / loop knobs (ref:train_resnet.py config.TRAIN)."""

    batch_size: int = 256             # GLOBAL batch (reference: per-GPU × N)
    lr: float = 0.1
    lr_steps: tuple = (30, 60, 90)    # epochs at which lr *= lr_factor
    lr_factor: float = 0.1
    warmup: bool = False
    warmup_lr: float = 0.0
    warmup_epochs: int = 5
    optimizer: str = "sgd"            # sgd | nag (ref: mx.optimizer SGD/NAG)
    mom: float = 0.9
    wd: float = 1e-4
    num_epochs: int = 100
    frequent: int = 50                # Speedometer log interval (batches)
    model_prefix: str = "checkpoints/resnet"
    load_epoch: Optional[int] = None
    auto_resume: bool = False         # resume from the latest checkpoint
    checkpoint_frequent: int = 0      # ALSO save every N batches (0 = off);
                                      # mid-epoch saves carry the iterator
                                      # cursor, so resume replays the exact
                                      # remaining stream. SIGTERM always
                                      # triggers one final mid-epoch save.
    begin_epoch: int = 0
    dtype: str = "float32"            # float32 | bfloat16
    remat: bool = False               # memonger equivalent (jax.checkpoint)
    fused_convbn: bool = False        # Pallas 1x1-conv+BN-stats kernels
    unit_chain: str = "off"           # off|xla|pallas: chain dataflow for
                                      # v1 bottleneck units (models/chain.py)
    grouped_dense: bool = False       # ResNeXt grouped 3x3 as block-diagonal
                                      # dense conv (full MXU lane occupancy)
    grouped_merge: int = 0            # groups fused per dense block
                                      # (0 = all -> fully dense)
    bn_subsample: int = 1             # BN stats from batch//s leading images
                                      # (s=8 at batch 256 = the reference's
                                      # per-GPU 32-image stats sample count)
    bn_grouped: bool = False          # with bn_subsample s: normalize s
                                      # INDEPENDENT groups, each with its own
                                      # stats — the exact single-chip analog
                                      # of the reference's per-GPU BatchNorm
    bn_stat_stride: int = 1           # BN stats from every s-th spatial
                                      # row/column of ALL images (1/s² of the
                                      # stats-sweep HBM traffic; keeps every
                                      # image in the sample, unlike bnsub)
    bn_ema: bool = False              # normalize with RUNNING stats
                                      # (stop-gradient; frozen-stats BN with
                                      # a per-step EMA refresh from the
                                      # bn_subsample sweep) — the BN input
                                      # gradient becomes elementwise
    bn_ema_warmup: int = -2           # steps of batch-stats BN before the
                                      # ema program takes over (negative =
                                      # that many EPOCHS); host-side program
                                      # switch in the Solver. Two epochs is
                                      # the measured convergence-bar value
                                      # (one epoch primed too coarsely —
                                      # the switch landed on still-moving
                                      # stats and the bar failed at 0.67)
    bn_ema_project: bool = True       # with bn_ema: project conv-kernel
                                      # gradients orthogonal to each output
                                      # filter (optim.radial_projection) —
                                      # reinstates the scale-invariance
                                      # backward that frozen-stats BN drops;
                                      # False = the pinned divergence
                                      # counter-evidence
    bn_ema_clamp: float = 1.0         # trust region vs the live batch
                                      # evidence: the normalizing variance
                                      # is clipped within clamp^2 of the
                                      # batch var, the mean within
                                      # (clamp-1)*sigma of the batch mean.
                                      # 1.0 (the measured convergence-bar
                                      # value) = normalize with the LIVE
                                      # batch stats, stop-gradient on the
                                      # variance; >1 admits running-stats
                                      # lag (measured: diverges or stalls
                                      # — 2.0 failed the bar at 0.67);
                                      # 0 disables clamping (the pinned
                                      # divergence counter-evidence)
    steps_per_dispatch: int = 1       # run K SGD steps per dispatched XLA
                                      # program (lax.scan over K stacked
                                      # batches) — amortizes per-dispatch
                                      # runtime overhead; the run-ahead
                                      # analog of the reference's
                                      # dependency engine (SURVEY §3.2)
    spd_unroll: bool = False          # with steps_per_dispatch K: unroll
                                      # the K-step scan (duplicated step
                                      # body; lets XLA schedule across
                                      # step boundaries at K-fold compile
                                      # cost)
    stem_s2d: bool = False            # ImageNet 7x7/2 stem conv lowered
                                      # in space-to-depth form (4x4/1 conv
                                      # on (H/2,W/2,12) input — exact
                                      # reindexing, 4x MXU lane occupancy
                                      # on the C=3 stem; param tree
                                      # unchanged, models/_StemConvS2D)
    aug_s2d: bool = False             # the on-device augmenter emits its
                                      # output directly in the stem's
                                      # space-to-depth block layout
                                      # (N,H/2,W/2,12) so the regroup
                                      # copies between augmenter and stem
                                      # disappear (round 4; bitwise the
                                      # standard values, reordered).
                                      # Needs stem_s2d, v1, ImageNet stem;
                                      # train path only (eval unchanged)
    pool_grad: str = "sas"            # stem maxpool backward: "sas" =
                                      # canonical select_and_scatter
                                      # (reference-exact argmax routing);
                                      # "mask" = parallel tie-splitting
                                      # VJP (ops/pool.py)
    remat_policy: str = "none"        # "none"|"conv": selective remat — save
                                      # conv outs + BN stats, recompute the
                                      # elementwise chain in backward
    xla_opts: str = ""                # k=v[,k=v] XLA compiler options;
                                      # "off" disables the measured TPU
                                      # defaults (utils/xla_opts.py)
    label_smooth: float = 0.0
    seed: int = 0
    check_numerics: bool = False      # jax_debug_nans/infs (SURVEY §5: the
                                      # NaiveEngine-style debug mode analog)
    # Parallelism
    num_devices: int = 0              # 0 = all local devices
    dp_mode: str = "jit"              # jit (GSPMD) | shard_map (explicit psum)
    sync_bn: bool = False             # cross-replica BN stats (reference: per-device)
    dp_comm_dtype: str = "float32"    # shard_map gradient all-reduce dtype
                                      # (float32 | bfloat16). bfloat16 halves
                                      # ICI bytes and matches both GSPMD's
                                      # implicit bf16 wgrad reduction and
                                      # MXNet multi_precision's fp16 kvstore
                                      # push (PERF_NOTES round 3j). GSPMD
                                      # jit mode ignores it (the compiler
                                      # already re-types the reduce).
    dp_sync: str = "step"             # gradient-sync cadence, the kvstore
                                      # TRANSPORT analog (mxnet:src/kvstore/
                                      # kvstore_dist.cc dist_sync/dist_async):
                                      # "step" = all-reduce every step
                                      # (dist_sync); "dispatch" = local SGD
                                      # with one parameter-space pmean per
                                      # dispatched program (the bounded-
                                      # staleness dist_async analog;
                                      # shard_map only — train/steps.py)


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Canned configs mirroring BASELINE.json `configs`
# ---------------------------------------------------------------------------

def cifar10_resnet18() -> Config:
    """BASELINE config #1: ResNet-18 on CIFAR-10."""
    cfg = Config()
    cfg.data = dataclasses.replace(
        cfg.data, num_classes=10, num_examples=50000,
        image_shape=(32, 32, 3), pipeline="memory",
        mean_rgb=(125.307, 122.95, 113.865), std_rgb=(62.993, 62.089, 66.705),
        min_random_area=1.0, max_aspect_ratio=0.0,
        random_h=0, random_s=0, random_l=0,
    )
    cfg.model = dataclasses.replace(cfg.model, depth=18, dataset="cifar10")
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=128, lr=0.1, lr_steps=(120, 160), num_epochs=200)
    return cfg


def imagenet_resnet50() -> Config:
    """BASELINE config #2: ResNet-50 ImageNet, single chip.

    Ships ``bn_ema`` (round 3c): live-batch-evidence normalization with a
    stop-gradient variance + radial-projection optimizer + 2-epoch
    batch-stats warmup. It PASSES the record-pipeline convergence bar
    (val 1.0 on the bar config — full ladder in PERF_NOTES.md round 3c;
    the throughput-only bnsub8 mode it replaces failed that bar).

    Per-chip batch 128 with linearly scaled lr 0.05 (round 3d): the
    batch-size optimum moved under the bn-ema program — measured
    2875 img/s/chip at bs128 vs 2759 at bs256 (sharp peak: 2574@64,
    2666@96, 2577@192 — 128 is the MXU lane width). lr follows the
    0.1-per-256 linear-scaling rule every preset here uses (the 1024-
    and 2048-batch presets scale the same way); under N-way DP the
    global batch is 128N — enable --warmup at pod scale exactly as the
    large-batch presets do.

    Execution schedule (round 3f/3g batteries, BATTERY_r3{f,g,h}.jsonl;
    K refined in round 3k, BATTERY_r3k.jsonl): 6 SGD steps per
    dispatched program with the scan UNROLLED (XLA schedules across
    step boundaries — the tail reduces of step i overlap the head convs
    of step i+1) and the space-to-depth stem lowering. Measured
    2987 img/s/chip vs 2871 at spd=1 (+4.0%); the K-curve at
    median-window resolution peaks sharply at 6 (K=4: 2981, K=5: 2982,
    K=6: 2987/2987, K=7: 2977, K=8: 2980 — the r3f "K=4 knee" was an
    artifact of the old ±2% measurement band), and the bs128 optimum
    holds under unroll (bs256: 2762). Both knobs are
    math-preserving: the K-step scan runs the identical update
    (tests/test_multistep.py pins scan ≡ sequential, unrolled ≡ looped,
    sharded ≡ single-device) and the s2d stem is an exact reindex of
    the same 7x7 kernel (f64 oracle, tests/test_stem_s2d.py; param tree
    unchanged, so checkpoints/export interchange) — the bn-ema
    convergence evidence carries over unchanged.

    Round 4 ships the augmentation-boundary fusions on top: the Pallas
    augmenter computes the HSL/contrast/illumination photometrics
    IN-KERNEL (deletes the f32 intermediate the split formulation
    round-tripped through HBM; `--augment-impl pallas-split` restores
    the old lowering) and ``aug_s2d`` emits the augmenter output
    directly in the stem's space-to-depth block layout (deletes the
    regroup copies). Both bit-match the XLA path
    (tests/test_pallas_augment.py, tests/test_stem_s2d.py). Measured
    ladder at median-window resolution: 2986.4 (r3 split) → 3002.3
    (fused photometrics) → **3008.6 img/s/chip** (+aug_s2d) —
    PERF_NOTES round 4a; the 3000 north star is crossed.

    dtype ships ``bfloat16`` (fp32 params/BN stats/head — the north-star
    dtype, and what every tuning row above was measured under);
    ``--dtype float32`` restores full-f32 compute for reference-exact
    numerics."""
    cfg = Config()
    cfg.train = dataclasses.replace(cfg.train, bn_ema=True,
                                    batch_size=128, lr=0.05,
                                    steps_per_dispatch=6, spd_unroll=True,
                                    stem_s2d=True, aug_s2d=True,
                                    dtype="bfloat16")
    return cfg


def imagenet_resnext50() -> Config:
    """BASELINE config #3: ResNeXt-50 32x4d.

    Execution recipe (measured, PERF_NOTES.md round-2 sweep + round 3d):
    the merge-2 block-diagonal lowering of the grouped 3x3s is the
    fastest on v5e (1723 img/s vs 1570 plain grouped); bn_subsample
    stays off — it regresses every ResNeXt variant ~7% (ResNet-only
    win); bn_ema (round 3d) lifts it to 1899 img/s (+9.8%) and carries
    the same convergence evidence as ResNet (record-pipeline bar PASS,
    ResNeXt rung in tests/test_convergence_record.py).
    The round-3h battery measured the family under the spd4-unroll +
    s2d dispatch schedule (1924 img/s, +11.7% over round 2), so the
    preset ships it (K=6 is only validated for R50 bs128). Round 4:
    the merge sweep VERDICT r3 #8 asked for confirms merge-2 under the
    new program (1937.7 vs merge-4 1795.5 / merge-8 1776.6), and the
    aug_s2d boundary fusion pays here too (1943.2, +0.28%,
    non-overlapping windows). Round 5: the family batch sweep moves the
    preset to the bs128 MXU-lane optimum — 1950.0 vs 1943.2 at bs256
    (+0.35%, non-overlapping windows; the round-3d "noise-level at
    bs128" verdict was measured under the pre-fusion program) — with
    lr following the linear-scaling rule all presets use."""
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, network="resnext", depth=50)
    cfg.train = dataclasses.replace(cfg.train, grouped_dense=True,
                                    grouped_merge=2, bn_ema=True,
                                    batch_size=128, lr=0.05,
                                    dtype="bfloat16",
                                    steps_per_dispatch=4, spd_unroll=True,
                                    stem_s2d=True, aug_s2d=True)
    return cfg


def imagenet_resnet101_bf16() -> Config:
    """BASELINE config #4: ResNet-101 bf16 mixed precision, large-batch warmup.

    bn_ema since round 3d: +6.7% measured at depth 101 (1839 vs 1723
    img/s at bs256; same BN layers and dynamics as the bar-validated
    R50 recipe — PERF_NOTES.md round 3c/3d). Ships the K=6 unrolled
    dispatch schedule + s2d stem: the round-3k precision battery
    measured 1847.9 at K=6 vs 1841.2 at K=4 (non-overlapping window
    intervals) — depth 101 follows R50's K=6 peak, unlike ResNeXt/R152
    which stay at their measured K=4. Round 4: ships aug_s2d — the
    boundary fusion is exactly neutral at depth 101 (1867.8 either way,
    PERF_NOTES family refresh) and never negative, so the family keeps
    one augmenter-boundary layout. Round 5: the family batch sweep
    measured the single-chip row at the preset's own 128/chip
    (1024 global / 8 devices): **2029.8 img/s, +8.7%** over the bs256
    family-row convention the earlier anchors used — the recipe's
    per-chip batch was already the MXU-lane optimum."""
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, depth=101)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=1024, lr=0.4, warmup=True, warmup_epochs=5,
        dtype="bfloat16", bn_ema=True,
        steps_per_dispatch=6, spd_unroll=True, stem_s2d=True,
        aug_s2d=True)
    return cfg


def imagenet_resnet152_dp() -> Config:
    """BASELINE config #5: ResNet-152 data-parallel pod scaling.

    bn_ema since round 3d: +3.8% measured at depth 152 (1268 vs 1222
    img/s at bs256 single-chip; composes with remat and both dp modes —
    the driver dryrun covers the sharded ema program). Ships the
    spd4-unroll + s2d dispatch schedule the round-3h battery measured
    the family under (1268 img/s at bs192 single-chip; 1279.8 under the
    round-4 aug fusions); the AOT pod audit (PERF_NOTES round 3j)
    validates HBM/collectives for the 16-chip program. Round 4: ships
    aug_s2d (+0.03% at depth 152, within window spread, never negative
    — PERF_NOTES family refresh); the GSPMD pod program with the
    XLA-augmenter s2d emit is AOT-audited (the probe honors the
    preset's aug_s2d). Round 5: the family batch sweep moves the
    recipe to 128/chip (2048 global / 16 devices, lr linear-scaled
    1.6 → 0.8): **1464.7 img/s single-chip, +14.4%** over the old
    bs192 row — the deepest net gains the most from the MXU-lane
    batch; the pod program is re-audited at the new global batch
    (audits/pod_r152_bs2048.json)."""
    cfg = Config()
    cfg.model = dataclasses.replace(cfg.model, depth=152)
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=2048, lr=0.8, warmup=True, warmup_epochs=5,
        dtype="bfloat16", remat=True, num_devices=16, bn_ema=True,
        steps_per_dispatch=4, spd_unroll=True, stem_s2d=True,
        aug_s2d=True)
    return cfg


PRESETS = {
    "cifar10_resnet18": cifar10_resnet18,
    "imagenet_resnet50": imagenet_resnet50,
    "imagenet_resnext50": imagenet_resnext50,
    "imagenet_resnet101_bf16": imagenet_resnet101_bf16,
    "imagenet_resnet152_dp": imagenet_resnet152_dp,
}


# ---------------------------------------------------------------------------
# CLI (the reference's train_imagenet-style flag surface)
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train ResNet/ResNeXt on TPU (rebuild of train_resnet.py)")
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="start from a canned BASELINE config")
    # model
    p.add_argument("--network", choices=["resnet", "resnext"], default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--version", type=int, choices=[1, 2], default=None)
    p.add_argument("--dataset", choices=["imagenet", "cifar10"], default=None)
    p.add_argument("--cardinality", type=int, default=None)
    # data
    p.add_argument("--data-dir", default=None)
    p.add_argument("--train-rec", default=None,
                   help=".rec file/glob/shard-prefix under data-dir")
    p.add_argument("--val-rec", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--num-examples", type=int, default=None)
    p.add_argument("--image-shape", default=None,
                   help="H,W,C (reference used C,H,W)")
    p.add_argument("--pipeline", choices=["synthetic", "memory", "record"],
                   default=None)
    p.add_argument("--preprocess-threads", type=int, default=None)
    p.add_argument("--canvas-size", type=int, default=None,
                   help="train letterbox canvas edge (0 = auto: 8/7 of "
                        "the output size); larger canvases reduce the "
                        "double-resample deviation vs the reference's "
                        "full-image crops at some throughput cost")
    # augmentation knobs (ref: mx.io.ImageRecordIter kwargs)
    p.add_argument("--no-random-resized-crop", action="store_true",
                   default=None, help="classic scale-crop sampling instead")
    p.add_argument("--min-random-area", type=float, default=None)
    p.add_argument("--max-random-area", type=float, default=None)
    p.add_argument("--max-aspect-ratio", type=float, default=None)
    p.add_argument("--min-aspect-ratio", type=float, default=None)
    p.add_argument("--min-random-scale", type=float, default=None)
    p.add_argument("--max-random-scale", type=float, default=None)
    p.add_argument("--random-h", type=int, default=None)
    p.add_argument("--random-s", type=int, default=None)
    p.add_argument("--random-l", type=int, default=None)
    p.add_argument("--max-rotate-angle", type=float, default=None)
    p.add_argument("--max-shear-ratio", type=float, default=None)
    p.add_argument("--max-random-contrast", type=float, default=None,
                   help="per-image contrast jitter: the mean-subtracted "
                        "pixel scales by U[1-c, 1+c] (reference "
                        "ImageRecordIter knob; off by default)")
    p.add_argument("--max-random-illumination", type=float, default=None,
                   help="per-image illumination jitter: U[-i, i] added in "
                        "raw pixel units before /std (reference "
                        "ImageRecordIter knob; off by default)")
    p.add_argument("--pad", type=int, default=None,
                   help="CIFAR pad-and-crop: pixels padded on every side "
                        "before the random crop (reference ImageRecordIter "
                        "knob). NOTE our default is 4 — the classic CIFAR "
                        "recipe — where mx.io.ImageRecordIter defaults to 0")
    p.add_argument("--fill-value", type=int, default=None,
                   help="constant fill for --pad padding. NOTE our default "
                        "is 0 (zero fill, the classic CIFAR recipe) where "
                        "mx.io.ImageRecordIter defaults to 255")
    p.add_argument("--rotate-backend", choices=["host", "device"],
                   default=None,
                   help="where the rotate/shear warp runs (host: record-"
                        "pipeline decode stage, the reference placement; "
                        "device: in-graph gather — 11x step cost, "
                        "PERF_NOTES.md)")
    p.add_argument("--augment-impl",
                   choices=["auto", "pallas", "pallas-split", "xla"],
                   default=None,
                   help="on-device augmentation lowering (auto: Pallas on "
                        "TPU except under multi-device GSPMD jit, where "
                        "Mosaic kernels cannot be partitioned and the "
                        "bit-identical XLA path runs instead)")
    # train
    p.add_argument("--batch-size", type=int, default=None, help="global batch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-steps", default=None, help="epochs, e.g. 30,60,90")
    p.add_argument("--lr-factor", type=float, default=None)
    p.add_argument("--warmup", action="store_true", default=None)
    p.add_argument("--warmup-epochs", type=int, default=None)
    p.add_argument("--optimizer", choices=["sgd", "nag"], default=None)
    p.add_argument("--mom", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--label-smooth", type=float, default=None)
    p.add_argument("--frequent", type=int, default=None)
    p.add_argument("--model-prefix", default=None)
    p.add_argument("--load-epoch", type=int, default=None)
    p.add_argument("--auto-resume", action="store_true", default=None,
                   help="resume from the latest checkpoint if present")
    p.add_argument("--checkpoint-frequent", type=int, default=None,
                   help="also checkpoint every N batches (with the data "
                        "cursor; resume replays the exact remaining "
                        "stream); SIGTERM always saves one final mid-epoch "
                        "checkpoint")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--remat", action="store_true", default=None,
                   help="gradient checkpointing (reference: --memonger)")
    p.add_argument("--fused-convbn", action="store_true", default=None,
                   help="Pallas fused 1x1-conv+BN-stats kernels")
    p.add_argument("--unit-chain", choices=["off", "xla", "pallas"],
                   default=None,
                   help="chain dataflow for v1 bottleneck units: BN stats "
                        "ride the 1x1 convs' MXU epilogues")
    p.add_argument("--grouped-dense", action="store_true", default=None,
                   help="lower ResNeXt grouped 3x3 convs as block-diagonal "
                        "dense convs (full MXU lane occupancy)")
    p.add_argument("--grouped-merge", type=int, default=None,
                   help="with --grouped-dense: fuse this many groups per "
                        "dense block (0 = all)")
    p.add_argument("--bn-subsample", type=int, default=None,
                   help="compute BN stats over batch//s leading images "
                        "(matches the reference's per-GPU BN stats SAMPLE "
                        "COUNT; combine with --bn-grouped for its exact "
                        "grouping semantics)")
    p.add_argument("--bn-grouped", action="store_true", default=None,
                   help="with --bn-subsample s: normalize s independent "
                        "groups, each with its own batch stats — the exact "
                        "single-chip analog of per-GPU BatchNorm")
    p.add_argument("--bn-stat-stride", type=int, default=None,
                   help="compute BN stats from every s-th spatial row and "
                        "column of ALL images (1/s^2 stats-sweep traffic; "
                        "keeps every image in the sample, unlike "
                        "--bn-subsample)")
    p.add_argument("--bn-ema", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="bn-ema mode (the imagenet_resnet50 preset "
                        "default): normalize with the live batch mean "
                        "(gradient-carrying) + stop-gradient clamped "
                        "variance, radial-projection optimizer, and a "
                        "--bn-ema-warmup batch-stats prime — measured "
                        "+9.7%% over full-batch BN at R50 bs256 "
                        "(PERF_NOTES.md round 3c). --no-bn-ema restores "
                        "reference-exact full-batch BN")
    p.add_argument("--bn-ema-warmup", type=int, default=None,
                   help="with --bn-ema: steps of batch-stats BN before "
                        "the ema program takes over (negative = that many "
                        "epochs; default -2 = two epochs, the measured "
                        "convergence-bar value)")
    p.add_argument("--bn-ema-project", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --bn-ema: radial-projection of conv-kernel "
                        "gradients (scale-invariance restoration; the mode "
                        "diverges without it — keep on outside "
                        "counter-evidence experiments)")
    p.add_argument("--bn-ema-clamp", type=float, default=None,
                   help="with --bn-ema: trust region of the normalizing "
                        "stats around the live batch evidence (>= 1; "
                        "1.0 = live batch stats, stop-gradient variance — "
                        "the measured convergence-bar value; larger admits "
                        "running-stats lag; 0 = unclamped, diverges)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="run K SGD steps per dispatched XLA program "
                        "(lax.scan over K stacked batches) — amortizes "
                        "per-dispatch runtime overhead; the run-ahead "
                        "analog of the reference's dependency engine")
    p.add_argument("--spd-unroll", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --steps-per-dispatch K: unroll the K-step "
                        "scan (XLA schedules across step boundaries; "
                        "K-fold compile cost)")
    p.add_argument("--stem-s2d", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="lower the ImageNet 7x7/2 stem conv in "
                        "space-to-depth form (exact reindex to a 4x4/1 "
                        "conv on 12 channels — 4x MXU lane occupancy; "
                        "param tree unchanged)")
    p.add_argument("--aug-s2d", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="emit the on-device augmentation output directly "
                        "in the stem's space-to-depth block layout "
                        "(deletes the regroup copies between augmenter "
                        "and stem; needs --stem-s2d, v1, ImageNet stem)")
    p.add_argument("--pool-grad", choices=["sas", "mask"], default=None,
                   help="stem maxpool backward: 'sas' = canonical "
                        "select_and_scatter (reference-exact argmax "
                        "routing), 'mask' = parallel tie-splitting VJP "
                        "(ops/pool.py)")
    p.add_argument("--remat-policy", choices=["none", "conv"], default=None,
                   help="selective remat: save conv outputs + BN stats, "
                        "recompute normalize/relu in backward")
    p.add_argument("--xla-opts", default=None,
                   help="k=v[,k=v] XLA compiler options; 'off' disables "
                        "the measured TPU defaults (utils/xla_opts.py)")
    p.add_argument("--check-numerics", action="store_true", default=None,
                   help="abort on NaN/Inf in any jitted computation")
    p.add_argument("--seed", type=int, default=None)
    # parallel
    p.add_argument("--num-devices", type=int, default=None,
                   help="devices on the data mesh (reference: --gpus)")
    p.add_argument("--dp-mode", choices=["jit", "shard_map"], default=None,
                   help="data-parallel impl (reference: --kv-store)")
    p.add_argument("--dp-comm-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="shard_map gradient all-reduce dtype; bfloat16 "
                        "halves ICI bytes (= GSPMD's implicit behavior "
                        "and MXNet multi_precision's fp16 push)")
    p.add_argument("--dp-sync", choices=["step", "dispatch"], default=None,
                   help="sync cadence (reference: kvstore dist_sync vs "
                        "dist_async): 'step' all-reduces gradients every "
                        "step; 'dispatch' runs steps-per-dispatch local SGD "
                        "steps then one parameter pmean per program "
                        "(bounded-staleness async analog; shard_map only)")
    return p


def _parse_tuple(s: str, typ=int) -> tuple:
    return tuple(typ(x) for x in s.split(",") if x.strip())


def config_from_args(args: argparse.Namespace) -> Config:
    cfg = PRESETS[args.preset]() if args.preset else Config()
    d, m, t = {}, {}, {}
    if args.network is not None: m["network"] = args.network
    if args.depth is not None: m["depth"] = args.depth
    if args.version is not None: m["version"] = args.version
    if args.dataset is not None: m["dataset"] = args.dataset
    if args.cardinality is not None: m["cardinality"] = args.cardinality
    if args.data_dir is not None: d["data_dir"] = args.data_dir
    if args.train_rec is not None: d["train_rec"] = args.train_rec
    if args.val_rec is not None: d["val_rec"] = args.val_rec
    if args.num_classes is not None: d["num_classes"] = args.num_classes
    if args.num_examples is not None: d["num_examples"] = args.num_examples
    if args.image_shape is not None:
        d["image_shape"] = _parse_tuple(args.image_shape)
    if args.pipeline is not None: d["pipeline"] = args.pipeline
    if args.preprocess_threads is not None:
        d["preprocess_threads"] = args.preprocess_threads
    if args.canvas_size is not None: d["canvas_size"] = args.canvas_size
    if args.no_random_resized_crop: d["random_resized_crop"] = False
    if args.min_random_area is not None:
        d["min_random_area"] = args.min_random_area
    if args.max_random_area is not None:
        d["max_random_area"] = args.max_random_area
    if args.max_aspect_ratio is not None:
        d["max_aspect_ratio"] = args.max_aspect_ratio
    if args.min_aspect_ratio is not None:
        d["min_aspect_ratio"] = args.min_aspect_ratio
    if args.min_random_scale is not None:
        d["min_random_scale"] = args.min_random_scale
    if args.max_random_scale is not None:
        d["max_random_scale"] = args.max_random_scale
    if args.random_h is not None: d["random_h"] = args.random_h
    if args.random_s is not None: d["random_s"] = args.random_s
    if args.random_l is not None: d["random_l"] = args.random_l
    if args.max_rotate_angle is not None:
        d["max_rotate_angle"] = args.max_rotate_angle
    if args.max_shear_ratio is not None:
        d["max_shear_ratio"] = args.max_shear_ratio
    if args.max_random_contrast is not None:
        d["max_random_contrast"] = args.max_random_contrast
    if args.max_random_illumination is not None:
        d["max_random_illumination"] = args.max_random_illumination
    if args.pad is not None: d["pad"] = args.pad
    if args.fill_value is not None: d["fill_value"] = args.fill_value
    if args.rotate_backend is not None:
        d["rotate_backend"] = args.rotate_backend
    if args.augment_impl is not None:
        d["augment_impl"] = args.augment_impl
    if args.batch_size is not None: t["batch_size"] = args.batch_size
    if args.lr is not None: t["lr"] = args.lr
    if args.lr_steps is not None: t["lr_steps"] = _parse_tuple(args.lr_steps)
    if args.lr_factor is not None: t["lr_factor"] = args.lr_factor
    if args.warmup: t["warmup"] = True
    if args.warmup_epochs is not None: t["warmup_epochs"] = args.warmup_epochs
    if args.optimizer is not None: t["optimizer"] = args.optimizer
    if args.mom is not None: t["mom"] = args.mom
    if args.wd is not None: t["wd"] = args.wd
    if args.num_epochs is not None: t["num_epochs"] = args.num_epochs
    if args.label_smooth is not None: t["label_smooth"] = args.label_smooth
    if args.frequent is not None: t["frequent"] = args.frequent
    if args.model_prefix is not None: t["model_prefix"] = args.model_prefix
    if args.load_epoch is not None: t["load_epoch"] = args.load_epoch
    if args.auto_resume: t["auto_resume"] = True
    if args.checkpoint_frequent is not None:
        t["checkpoint_frequent"] = args.checkpoint_frequent
    if args.dtype is not None: t["dtype"] = args.dtype
    if args.remat: t["remat"] = True
    if args.fused_convbn: t["fused_convbn"] = True
    if args.unit_chain is not None: t["unit_chain"] = args.unit_chain
    if args.grouped_dense: t["grouped_dense"] = True
    if args.grouped_merge is not None: t["grouped_merge"] = args.grouped_merge
    if args.bn_subsample is not None: t["bn_subsample"] = args.bn_subsample
    if args.bn_grouped: t["bn_grouped"] = True
    if args.bn_stat_stride is not None:
        t["bn_stat_stride"] = args.bn_stat_stride
    if args.bn_ema is not None: t["bn_ema"] = args.bn_ema
    if args.bn_ema_project is not None:
        t["bn_ema_project"] = args.bn_ema_project
    if args.bn_ema_warmup is not None: t["bn_ema_warmup"] = args.bn_ema_warmup
    if args.bn_ema_clamp is not None: t["bn_ema_clamp"] = args.bn_ema_clamp
    if args.steps_per_dispatch is not None:
        t["steps_per_dispatch"] = args.steps_per_dispatch
    if args.spd_unroll is not None: t["spd_unroll"] = args.spd_unroll
    if args.stem_s2d is not None: t["stem_s2d"] = args.stem_s2d
    if args.aug_s2d is not None: t["aug_s2d"] = args.aug_s2d
    if args.pool_grad is not None: t["pool_grad"] = args.pool_grad
    if args.remat_policy is not None: t["remat_policy"] = args.remat_policy
    if args.xla_opts is not None: t["xla_opts"] = args.xla_opts
    if args.check_numerics: t["check_numerics"] = True
    if args.seed is not None: t["seed"] = args.seed
    if args.num_devices is not None: t["num_devices"] = args.num_devices
    if args.dp_mode is not None: t["dp_mode"] = args.dp_mode
    if args.dp_comm_dtype is not None:
        t["dp_comm_dtype"] = args.dp_comm_dtype
    if args.dp_sync is not None: t["dp_sync"] = args.dp_sync
    return Config(
        data=dataclasses.replace(cfg.data, **d),
        model=dataclasses.replace(cfg.model, **m),
        train=dataclasses.replace(cfg.train, **t),
    )


def parse_config(argv: Optional[Sequence[str]] = None) -> Config:
    return config_from_args(build_parser().parse_args(argv))
