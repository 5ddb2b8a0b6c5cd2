"""resnet_tpu — a TPU-native ResNet/ResNeXt training framework.

A from-scratch rebuild of the capability surface of XiaotaoChen/resnet.mxnet
(an MXNet-1.x ImageNet training harness), re-designed TPU-first:

  - models/   Flax ResNet/ResNeXt graph builders    (ref:symbol/resnet.py, resnext.py)
  - ops/      in-graph metrics + Pallas augmentation (ref: mx.metric, mxnet image_aug_default.cc)
  - train/    train state, LR schedules, jitted steps, Solver.fit
              (ref:core/solver.py, core/scheduler.py, mx.mod.Module.fit)
  - data/     RecordIO-compatible ingest + native JPEG decode + prefetch
              (ref: mx.io.ImageRecordIter, dmlc recordio)
  - parallel/ device mesh, data-parallel psum, multi-host init
              (ref: mx.kvstore 'device'/'dist_sync', tools/launch.py)
  - utils/    logging, profiler hooks (ref: Speedometer, mx.profiler)

The compute path is jax/XLA/Pallas (NHWC, bf16 on the MXU); the runtime around
it (RecordIO framing, JPEG decode pool) is native C++ bound via ctypes.
"""

__version__ = "0.1.0"
