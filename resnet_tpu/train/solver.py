"""Solver: the fit loop (ref:core/solver.py Solver.fit / mx Module.fit).

Per-epoch structure mirrors SURVEY.md §3.2 exactly, but the per-batch body is
one jitted XLA program (steps.py) and the host loop only: pulls prefetched
batches, fires the step, and every ``frequent`` batches syncs the metric
scalars for the Speedometer. The dependency-engine run-ahead of MXNet is
replaced by JAX async dispatch — the Python loop runs ahead of the device by
the prefetch depth.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from resnet_tpu.config import Config
from resnet_tpu.data.loader import DataIter
from resnet_tpu.data.prefetch import prefetch_grouped, prefetch_to_device
from resnet_tpu.ops import augment
from resnet_tpu.ops.metrics import MetricAccumulator
from resnet_tpu.parallel.mesh import make_mesh
from resnet_tpu.train import checkpoint as ckpt
from resnet_tpu.train.callback import BatchEndParam, Speedometer
from resnet_tpu.train.schedule import schedule_from_config
from resnet_tpu.train.state import TrainState, create_train_state
from resnet_tpu.train.steps import make_eval_step, make_train_step
from resnet_tpu.utils.logging import setup_logging


def _augment_fns(cfg: Config, multi_device_jit: bool = False):
    """Select the on-device train/eval preprocessing for the dataset.

    ``multi_device_jit``: the caller will run the step under GSPMD ``jit``
    over a >1-device mesh. Mosaic (Pallas) kernels cannot be automatically
    partitioned by GSPMD (the AOT pod-compile audit reproduces the compile
    error: "Mosaic kernels cannot be automatically partitioned"), so
    ``auto`` selects the XLA augmentation lowering there — measured
    bit-identical to the Pallas kernel (tests/test_pallas_augment.py) and
    natively partitionable. Pallas stays the pick for single-device and
    ``--dp-mode shard_map`` (the kernel runs inside the per-replica body).
    """
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    d = cfg.data
    if cfg.model.dataset == "cifar10":
        train_fn = lambda imgs, rng, dims=None: augment.augment_cifar(
            imgs, rng, d, dtype)
        eval_fn = lambda imgs: augment.normalize(
            imgs, d.mean_rgb, d.std_rgb, dtype)
    else:
        if (d.pipeline == "record" and d.rotate_backend == "host"
                and (d.max_rotate_angle > 0 or d.max_shear_ratio > 0)):
            # the record pipeline already warped the canvases on the host
            # (data/host_warp.py — the reference's warpAffine placement);
            # zero the angles so the in-graph path doesn't warp twice.
            # Non-record pipelines have no host decode stage and keep the
            # in-graph gather.
            import dataclasses as _dc
            d = _dc.replace(d, max_rotate_angle=0.0, max_shear_ratio=0.0)
        out_hw = d.image_shape[:2]
        s2d = getattr(cfg.train, "aug_s2d", False)
        if s2d and (not cfg.train.stem_s2d or cfg.model.version != 1
                    or cfg.model.dataset == "cifar10"
                    or out_hw[0] % 2 or out_hw[1] % 2):
            raise ValueError(
                "--aug-s2d (augmenter emits space-to-depth blocks) needs "
                "--stem-s2d, a v1 network, the ImageNet stem and an even "
                "output size")
        impl = d.augment_impl
        if impl == "auto":
            impl = ("pallas" if jax.default_backend() == "tpu"
                    and not multi_device_jit else "xla")
        elif impl.startswith("pallas") and multi_device_jit:
            raise ValueError(
                "augment_impl='pallas' cannot run under GSPMD jit on a "
                "multi-device mesh (Mosaic kernels cannot be automatically "
                "partitioned); use --dp-mode shard_map or "
                "--augment-impl xla (bit-identical)")
        if impl.startswith("pallas"):
            # measured bit-identical to the XLA path and faster on v5e
            # (PERF_NOTES.md); falls back internally for the rotation
            # variant. 'pallas-split' restores the pre-round-4 split
            # photometric formulation (f32 intermediate + XLA HSL) for
            # A/B measurement.
            from resnet_tpu.ops.augment_pallas import augment_imagenet_pallas
            split = impl == "pallas-split"
            train_fn = lambda imgs, rng, dims=None: augment_imagenet_pallas(
                imgs, rng, d, out_hw, dtype, dims=dims,
                split_photometric=split, s2d=s2d)
        else:
            train_fn = lambda imgs, rng, dims=None: augment.augment_imagenet(
                imgs, rng, d, out_hw, dtype, dims=dims, s2d=s2d)
        eval_fn = lambda imgs: (
            augment.eval_center_crop(imgs, d, out_hw, dtype)
            if imgs.shape[1:3] != tuple(out_hw)
            else augment.normalize(imgs, d.mean_rgb, d.std_rgb, dtype))
    return train_fn, eval_fn


class Solver:
    """fit(train_iter, eval_iter) driver (ref:core/solver.py)."""

    def __init__(self, cfg: Config, log_file: Optional[str] = None):
        self.log = setup_logging(log_file)
        if jax.process_index() != 0:
            # head-node-only logging (ref: dist workers log on rank 0)
            import logging as _logging
            self.log.setLevel(_logging.WARNING)
        t = cfg.train
        n_dev = t.num_devices or len(jax.devices())
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None
        if t.batch_size % max(n_dev, 1) != 0:
            raise ValueError(
                f"batch_size {t.batch_size} not divisible by {n_dev} devices")
        if t.sync_bn and t.dp_mode == "shard_map":
            # GSPMD jit mode computes BN over the GLOBAL sharded batch
            # (sync-BN semantics for free); the shard_map path is the
            # MXNet-parity per-replica BN.
            raise ValueError(
                "sync_bn requires --dp-mode jit (global-batch BN); "
                "--dp-mode shard_map is per-replica BN like MXNet per-GPU")
        if (t.bn_subsample > 1 and t.dp_mode == "shard_map" and n_dev > 1):
            # bn_subsample counts sub-batches of the PER-REPLICA batch;
            # under shard_map the batch is already split n_dev ways, so keep
            # the intended absolute stats-sample count (batch/s images) by
            # rescaling. The caller's cfg is left untouched (a second Solver
            # built from the same object must see the same knobs) — the
            # effective value lives in this Solver's private copy.
            eff = max(1, t.bn_subsample // n_dev)
            self.log.info(
                "bn_subsample %d -> %d under %d-way shard_map "
                "(per-replica batches)", t.bn_subsample, eff, n_dev)
            import dataclasses as _dc
            cfg = cfg.replace(train=_dc.replace(t, bn_subsample=eff))
            t = cfg.train
        self.cfg = cfg
        self._sigterm = False
        self.iter_state = {}
        # --bn-ema runs the first bn_ema_warmup steps under batch-stats BN
        # (to prime the running stats the ema program normalizes with),
        # then swaps the state's apply_fn — a host-side program switch; the
        # two models share one param/variable tree. fit() arms the switch;
        # a bare train_epoch() call runs whatever apply_fn the state holds.
        self._host_step = 0
        self._bn_ema_switch = None
        self._bn_ema_pending = False
        if t.bn_ema:
            import dataclasses as _dc
            from resnet_tpu.models.registry import get_model
            # warmup primes the EMA under FULL-BATCH stats BN (the
            # convergence-sound shipped mode — not bnsub, whose subset
            # stats failed the bar); same param/variable tree
            warm = cfg.replace(train=_dc.replace(
                t, bn_ema=False, bn_subsample=1, bn_grouped=False))
            self._bn_ema_warmup_apply = get_model(warm).apply
            self._bn_ema_apply = get_model(cfg).apply
        # orbax steps THIS run has written (or resumed from): the
        # rank-deterministic source of the overwrite decision — orbax
        # delete is a collective, so ranks must agree without peeking at
        # the filesystem (checkpoint.py multi-process rule)
        self._saved_steps = set()
        aug_fn, eval_fn = _augment_fns(
            cfg, multi_device_jit=(self.mesh is not None
                                   and t.dp_mode == "jit"
                                   and self.mesh.size > 1))
        from resnet_tpu.utils.xla_opts import compiler_options
        xla_opts = compiler_options(getattr(t, "xla_opts", None))
        # multi-step dispatch (steps._scan_steps): K SGD steps ride one
        # dispatched XLA program. Epoch tails shorter than K run through a
        # lazily-built single-step program (exact same per-step math).
        self._spd = max(1, t.steps_per_dispatch)
        import jax.numpy as jnp
        comm_dtype = (jnp.bfloat16
                      if getattr(t, "dp_comm_dtype", "float32") == "bfloat16"
                      else None)
        # dp_sync='dispatch' (the dist_async analog) defers replica sync to
        # the dispatch boundary; the epoch-tail single-step program built by
        # _mk_step(1) keeps the same cadence — at k=1 it is mathematically
        # step-sync (steps.py module docstring).
        self._mk_step = lambda k: make_train_step(
            self.mesh, t.dp_mode, t.label_smooth, augment_fn=aug_fn,
            compiler_options=xla_opts, steps_per_dispatch=k,
            spd_unroll=t.spd_unroll, comm_dtype=comm_dtype,
            dp_sync=getattr(t, "dp_sync", "step"))
        self.train_step = self._mk_step(self._spd)
        self._single_step = self.train_step if self._spd == 1 else None
        self.eval_step = make_eval_step(
            self.mesh, t.dp_mode, preprocess_fn=eval_fn)
        self.schedule = schedule_from_config(cfg)
        # auto_reset=True matches the reference Speedometer default: each
        # log line (and metrics.jsonl 'train' row) reports the per-window
        # average, not the epoch-cumulative one.
        self.speedometer = Speedometer(t.batch_size, t.frequent,
                                       auto_reset=True)
        from resnet_tpu.utils.metric_writer import MetricWriter
        self.metric_writer = MetricWriter(
            f"{t.model_prefix}.metrics.jsonl"
            if t.model_prefix and jax.process_index() == 0 else None)

    # -- state ------------------------------------------------------------

    def init_state(self) -> TrainState:
        """Init params, or resume from --load-epoch (ref:train_resnet.py).

        ``--auto-resume`` extends the reference's manual restart-from-
        checkpoint recovery story (SURVEY.md §5 failure recovery): the
        relaunched job finds the latest epoch itself.
        """
        t = self.cfg.train
        # ranks must be aligned before the FIRST cross-process collective,
        # which on a resume path is orbax's own allgather barrier inside
        # latest_epoch/load_checkpoint (parallel/dist.py barrier rationale)
        from resnet_tpu.parallel.dist import barrier
        barrier("resnet_tpu:init")
        state = create_train_state(self.cfg)
        self.begin_epoch = t.begin_epoch
        self.iter_state = {}
        load_epoch = t.load_epoch
        if load_epoch is None and t.auto_resume and t.model_prefix:
            load_epoch = ckpt.latest_epoch(t.model_prefix)
            if load_epoch is not None:
                self.log.info("auto-resume found epoch %d", load_epoch)
        if load_epoch is not None:
            import os
            mx_params = f"{t.model_prefix}-{load_epoch:04d}.params"
            if (not ckpt.has_epoch(t.model_prefix, load_epoch)
                    and os.path.exists(mx_params)):
                # the switch-from-the-reference path: --load-epoch points
                # at an MXNet checkpoint (mx.model.save_checkpoint binary,
                # utils/mxnet_params.py). Weights + BN stats restore;
                # momentum restarts at zero — exactly the reference's own
                # resume semantics (SURVEY.md §3.4 quirk: optimizer state
                # is never checkpointed there).
                import jax.numpy as jnp

                from resnet_tpu.utils.export import load_mxnet_checkpoint
                params, stats = load_mxnet_checkpoint(
                    t.model_prefix, load_epoch, state.params,
                    state.batch_stats)
                # step drives the LR schedule: epochs * steps/epoch, like
                # MXNet recovering lr from num_update ∝ begin_epoch
                steps_per_epoch = max(
                    1, self.cfg.data.num_examples // t.batch_size)
                state = state.replace(
                    params=jax.device_put(params),
                    batch_stats=jax.device_put(stats),
                    step=jnp.asarray(load_epoch * steps_per_epoch,
                                     jnp.int32))
                self.begin_epoch = load_epoch
                self.log.info(
                    "Resumed from MXNet checkpoint %s (epoch %d)",
                    mx_params, load_epoch)
                return state
            state, self.iter_state = ckpt.load_checkpoint(
                t.model_prefix, load_epoch, state)
            self.begin_epoch = load_epoch
            # every rank loaded this step, so every rank agrees it exists
            # (a later save to the same step must overwrite)
            self._saved_steps.add(load_epoch)
            self.log.info("Resumed from epoch %d (step %d)",
                          load_epoch, int(state.step))
        return state

    # -- loops ------------------------------------------------------------

    def train_epoch(self, state: TrainState, train_iter: DataIter,
                    epoch: int, start_nbatch: int = 0) -> TrainState:
        t = self.cfg.train
        # `win` resets after every Speedometer log (the reference's
        # auto_reset per-window metrics); `acc` accumulates the whole epoch
        # for the end-of-epoch summary and last_train_metrics.
        win, acc = MetricAccumulator(), MetricAccumulator()
        self.speedometer.reset()
        window = []   # device-resident metric dicts; synced only at log time
        nbatch = start_nbatch   # nonzero on mid-epoch resume
        if self._spd == 1:
            source = ((b, 1) for b in prefetch_to_device(
                train_iter.epoch_iter(epoch),
                size=self.cfg.data.prefetch_buffer, mesh=self.mesh))
        else:
            # K host batches stack into one device batch per dispatch;
            # grouping restarts at the epoch (and any resume) boundary, so
            # log/checkpoint cadences below use boundary-CROSSING checks
            # rather than exact multiples
            source = prefetch_grouped(
                train_iter.epoch_iter(epoch), self._spd,
                size=self.cfg.data.prefetch_buffer, mesh=self.mesh)
        for batch, n in source:
            if self._bn_ema_pending and self._host_step >= self._bn_ema_switch:
                state = state.replace(apply_fn=self._bn_ema_apply)
                self._bn_ema_pending = False
                self.log.info(
                    "bn-ema: warmup done at step %d — switching to "
                    "running-stats normalization%s", self._host_step,
                    "" if self._host_step == self._bn_ema_switch else
                    f" (configured step {self._bn_ema_switch} rounded to "
                    f"the next {self._spd}-step dispatch boundary)")
            if n == self._spd:
                step_fn = self.train_step
            else:
                if self._single_step is None:   # epoch tail < K
                    self._single_step = self._mk_step(1)
                step_fn = self._single_step
            state, metrics = step_fn(state, batch)
            self._host_step += n
            prev_nbatch = nbatch
            nbatch += n
            window.append(metrics)
            if t.checkpoint_frequent and t.model_prefix \
                    and (nbatch // t.checkpoint_frequent
                         > prev_nbatch // t.checkpoint_frequent):
                self._save_mid_epoch(state, train_iter, epoch, nbatch)
            if self._sigterm:
                # save the exact position (state + data cursor) and exit;
                # a relaunch with --auto-resume replays the identical
                # remaining stream (SURVEY.md §3.4 "match or exceed").
                # Multi-process: the orbax save is a COLLECTIVE — a lone
                # signaled rank saving would hang the barrier, so dist
                # jobs exit immediately and recovery falls back to the
                # last collective --checkpoint-frequent/epoch save.
                if t.model_prefix and jax.process_count() == 1:
                    self._save_mid_epoch(state, train_iter, epoch, nbatch)
                self.log.warning(
                    "SIGTERM: checkpointed epoch %d batch %d; exiting",
                    epoch, nbatch)
                raise SystemExit(143)
            if nbatch // t.frequent > prev_nbatch // t.frequent:
                # the ONLY sync in the hot loop: pull `frequent` batches of
                # scalar sums at once (MXNet syncs outputs per batch for
                # metric.update — we are strictly lazier).
                for m in jax.device_get(window):
                    win.update(m)
                    acc.update(m)
                window = []
                global_step = epoch * train_iter.steps_per_epoch + nbatch
                lr = float(jax.device_get(self.schedule(global_step - 1)))
                win_metrics = win.get()
                self.speedometer(BatchEndParam(
                    epoch=epoch, nbatch=nbatch, metrics=win_metrics, lr=lr),
                    reset_fn=win.reset)
                self.metric_writer.write(
                    "train", epoch, global_step, win_metrics, lr=lr,
                    samples_per_sec=self.speedometer.last_speed)
        for m in jax.device_get(window):
            acc.update(m)
        m = acc.get()
        self.last_train_metrics = m
        self.log.info("Epoch[%d] Train-accuracy=%.6f", epoch, m["accuracy"])
        self.log.info("Epoch[%d] Train-cross-entropy=%.6f", epoch,
                      m["cross-entropy"])
        return state

    def validate(self, state: TrainState, eval_iter: DataIter,
                 epoch: int) -> dict:
        acc = MetricAccumulator()
        for batch in prefetch_to_device(
                eval_iter.epoch_iter(0), size=2, mesh=self.mesh):
            acc.update(jax.device_get(self.eval_step(state, batch)))
        m = acc.get()
        self.metric_writer.write("val", epoch, -1, m)
        self.log.info("Epoch[%d] Validation-accuracy=%.6f", epoch,
                      m["accuracy"])
        self.log.info("Epoch[%d] Validation-top_k_accuracy_5=%.6f", epoch,
                      m["top_k_accuracy_5"])
        self.log.info("Epoch[%d] Validation-cross-entropy=%.6f", epoch,
                      m["cross-entropy"])
        return m

    def _save_mid_epoch(self, state: TrainState, train_iter: DataIter,
                        epoch: int, nbatch: int) -> None:
        """Batch-granular save: orbax step = completed-epoch count (epoch),
        intra-epoch progress rides in iter_state — so ``--auto-resume``
        restarts at begin_epoch=epoch and the iterator seeks to the exact
        batch. ``force`` because successive saves in one epoch share the
        step number."""
        # drain in-flight steps first: their psums and orbax's own gloo
        # allgather barrier otherwise interleave across ranks
        jax.block_until_ready(state.params)
        ckpt.save_checkpoint(
            self.cfg.train.model_prefix, epoch, state,
            iter_state=train_iter.cursor_state(nbatch),
            force=epoch in self._saved_steps)
        self._saved_steps.add(epoch)
        self.log.info("Saved mid-epoch checkpoint (epoch %d, batch %d)",
                      epoch, nbatch)

    def fit(self, train_iter: DataIter,
            eval_iter: Optional[DataIter] = None,
            num_epochs: Optional[int] = None) -> TrainState:
        """The training entry (ref: Module.fit / Solver.fit)."""
        import signal
        import threading

        t = self.cfg.train
        state = self.init_state()
        train_iter.load_state_dict(self.iter_state)  # replay data stream
        num_epochs = num_epochs or t.num_epochs
        self._host_step = int(state.step)   # == global batches completed
        if t.bn_ema:
            self._bn_ema_switch = (
                t.bn_ema_warmup if t.bn_ema_warmup >= 0
                else -t.bn_ema_warmup * train_iter.steps_per_epoch)
            if self._host_step < self._bn_ema_switch:
                # resume-deterministic: the active program is a pure
                # function of (config, step), so a killed/resumed run
                # re-enters the same phase
                state = state.replace(apply_fn=self._bn_ema_warmup_apply)
                self._bn_ema_pending = True
            else:
                # past the switch (resume landed in the ema phase): pin
                # the canonical ema apply so the active program is the
                # same OBJECT regardless of which path produced the state
                state = state.replace(apply_fn=self._bn_ema_apply)
        from resnet_tpu.utils.profiler import maybe_trace

        if t.model_prefix and jax.process_index() == 0:
            # the checkpoint pair carries its own graph, like
            # mx.model.save_checkpoint writing prefix-symbol.json next to
            # the .params files — tools/predict.py reads the structure
            # back from it (utils/symbol_export.parse_symbol_json)
            from resnet_tpu.utils.symbol_export import save_symbol
            save_symbol(t.model_prefix, self.cfg)

        # align ranks before the FIRST collective dispatch: per-rank setup
        # skew (init/compile/cache-load on a shared host) can exceed the
        # ~30s gloo context-creation window (parallel/dist.py barrier)
        from resnet_tpu.parallel.dist import barrier
        barrier("resnet_tpu:fit")

        # SIGTERM → one final mid-epoch save, then exit 143. The handler
        # only flips a flag; the save happens at a batch boundary in
        # train_epoch (a signal-safe point with a consistent state +
        # cursor pair). Main-thread only: signal.signal raises elsewhere.
        self._sigterm = False
        prev_handler = None
        in_main = threading.current_thread() is threading.main_thread()
        if in_main and t.model_prefix:
            def _on_term(signum, frame):
                self._sigterm = True
            prev_handler = signal.signal(signal.SIGTERM, _on_term)

        try:
            for epoch in range(self.begin_epoch, num_epochs):
                tic = time.perf_counter()
                # mid-epoch resume: keep batch numbering (Speedometer,
                # logged lr, checkpoint cadence) aligned with the seeked
                # data stream
                start_nbatch = (self.iter_state.get("batch", 0)
                                if (epoch == self.begin_epoch
                                    and self.iter_state.get("epoch") == epoch)
                                else 0)
                start_nbatch = min(start_nbatch, train_iter.steps_per_epoch)
                if epoch == self.begin_epoch:
                    # mx.profiler AUTOSTART analog:
                    # RESNET_TPU_PROFILE=<logdir> traces the first epoch
                    with maybe_trace():
                        state = self.train_epoch(state, train_iter, epoch,
                                                 start_nbatch)
                else:
                    state = self.train_epoch(state, train_iter, epoch)
                self.log.info("Epoch[%d] Time cost=%.3f", epoch,
                              time.perf_counter() - tic)
                if eval_iter is not None:
                    self.validate(state, eval_iter, epoch)
                if t.model_prefix:
                    ckpt.save_checkpoint(
                        t.model_prefix, epoch + 1, state,
                        iter_state=train_iter.state_dict(),
                        force=(epoch + 1) in self._saved_steps)
                    self._saved_steps.add(epoch + 1)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        return state
