"""Jitted train/eval steps — the hot loop as ONE XLA program.

The reference's per-batch body (SURVEY.md §3.2: forward_backward across
executors, kv.push/pull gradient reduce, sgd_mom_update, metric update —
dozens of engine-scheduled kernels and PCIe transfers) collapses on TPU into
a single compiled ``step(state, batch) -> (state, metrics)``:

  - forward+backward: XLA autodiff, convs on the MXU, elementwise fused;
  - gradient all-reduce: ``psum`` over the ICI ``data`` mesh axis (the
    kvstore 'device'/'nccl'/'dist_sync' equivalent — SURVEY.md §2d);
  - optimizer: MXNet-semantics SGD fused into the same program;
  - metrics: computed in-graph, returned as scalar sums.

Two data-parallel modes (``--dp-mode``, the kvstore selector's analog):
  - ``jit``: GSPMD — jit over the mesh with the batch sharded on the data
    axis; XLA inserts the gradient all-reduce and overlaps it with the
    backward pass. BatchNorm reduces over the GLOBAL batch (sync-BN
    semantics).
  - ``shard_map``: explicit SPMD — per-replica BN statistics exactly like
    MXNet's per-GPU BatchNorm, explicit ``lax.pmean`` on grads and on the
    updated BN running stats (the reference averages aux states across
    executors on get_params).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from resnet_tpu.ops.metrics import cross_entropy_loss, metric_sums
from resnet_tpu.parallel.mesh import (DATA_AXIS, batch_sharded, replicated,
                                      stacked_batch_sharded)
from resnet_tpu.train.state import TrainState


def train_step(state: TrainState, batch, label_smooth: float = 0.0,
               axis_name: Optional[str] = None,
               augment_fn: Optional[Callable] = None,
               comm_dtype=None):
    """One SGD step. Pure; jit/shard_map wrappers below.

    ``augment_fn(images_u8, rng) -> images`` runs INSIDE this XLA program
    (fused on-device augmentation — SURVEY.md §7.6); per-step randomness is
    ``fold_in(state.rng, state.step)`` (+ axis index under shard_map), so a
    resumed run replays the identical augmentation stream.
    """
    images, labels = batch["image"], batch["label"]
    if augment_fn is not None:
        rng = jax.random.wrap_key_data(state.rng)
        rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        # dims (N,4) ships per-image original sizes from the letterboxing
        # record loader so the crop sampler sees the full image domain
        images = augment_fn(images, rng, batch.get("dims"))

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
        loss = cross_entropy_loss(logits, labels, label_smooth)
        return loss, (logits, mutated["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    if axis_name is not None:
        # explicit DP: all-reduce grads (kvstore push+pull equivalent) and
        # keep BN running stats replica-consistent. ``comm_dtype`` reduces
        # the gradients in that dtype (e.g. bf16): the pod-compile audit
        # (PERF_NOTES round 3j) shows GSPMD already sums wgrads in bf16
        # before the f32 convert — and MXNet multi_precision pushed fp16
        # gradients to the kvstore (mxnet:src/kvstore) — so this matches
        # both at half the ICI bytes. BN stats stay f32 (tiny, precision-
        # sensitive).
        if comm_dtype is not None:
            orig = jax.tree.map(lambda g: g.dtype, grads)
            grads = jax.tree.map(lambda g: g.astype(comm_dtype), grads)
            grads = jax.lax.pmean(grads, axis_name)
            grads = jax.tree.map(lambda g, d: g.astype(d), grads, orig)
        else:
            grads = jax.lax.pmean(grads, axis_name)
        new_stats = jax.lax.pmean(new_stats, axis_name)

    new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
    metrics = metric_sums(logits, labels, loss)
    if axis_name is not None:
        metrics = jax.lax.psum(metrics, axis_name)
    return new_state, metrics


def eval_step(state: TrainState, batch, axis_name: Optional[str] = None,
              preprocess_fn: Optional[Callable] = None):
    """Validation forward (running-average BN) + metric sums."""
    images, labels = batch["image"], batch["label"]
    mask = batch.get("mask")
    if preprocess_fn is not None:
        images = preprocess_fn(images)
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False)
    loss = cross_entropy_loss(logits, labels, mask=mask)
    metrics = metric_sums(logits, labels, loss, mask=mask)
    if axis_name is not None:
        metrics = jax.lax.psum(metrics, axis_name)
    return metrics


def _scan_steps(step_fn: Callable, k: int, unroll: bool = False) -> Callable:
    """Run ``k`` train steps in ONE dispatched XLA program.

    ``lax.scan`` over batches stacked on a leading ``k`` axis; the train
    state is the carry (per-step randomness stays exact — each scanned step
    folds its own ``state.step`` into the augmentation key), metric sums
    accumulate across the k steps. This is the TPU analog of the
    reference's dependency-engine run-ahead (SURVEY.md §3.2: the MXNet
    Python loop queues batches ahead of the device): amortizes per-dispatch
    host/runtime overhead over k device steps. ``unroll`` duplicates the
    step body k-fold so XLA can schedule across step boundaries (k-fold
    compile cost; same math).
    """
    def multi(state, batches):
        state, ms = jax.lax.scan(step_fn, state, batches, length=k,
                                 unroll=k if unroll else 1)
        return state, jax.tree.map(lambda x: x.sum(0), ms)
    return multi


def make_train_step(mesh: Optional[Mesh] = None, dp_mode: str = "jit",
                    label_smooth: float = 0.0,
                    augment_fn: Optional[Callable] = None,
                    compiler_options: Optional[dict] = None,
                    steps_per_dispatch: int = 1,
                    spd_unroll: bool = False,
                    comm_dtype=None) -> Callable:
    """Compile the train step for the given mesh/mode.

    Returns ``f(state, batch) -> (state, metrics)`` with the state donated
    (in-place HBM update, like MXNet's mutable NDArray weights but checked
    by XLA aliasing instead of engine var-sequencing).
    ``compiler_options`` are per-program XLA overrides (utils/xla_opts.py
    supplies the measured TPU defaults, e.g. the scoped-VMEM fusion budget).

    ``steps_per_dispatch=k>1`` returns the multi-step program instead:
    ``f(state, batches)`` where every batch leaf carries a leading ``k``
    axis (k host batches stacked), runs k SGD steps per dispatch and
    returns metric sums accumulated over them (see ``_scan_steps``).
    """
    co = compiler_options or None
    k = steps_per_dispatch
    if k < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {k}")
    if mesh is None:
        fn = partial(train_step, label_smooth=label_smooth,
                     augment_fn=augment_fn)
        if k > 1:
            fn = _scan_steps(fn, k, spd_unroll)
        return jax.jit(fn, donate_argnums=0, compiler_options=co)

    if dp_mode == "jit":
        fn = partial(train_step, label_smooth=label_smooth,
                     augment_fn=augment_fn)
        repl = replicated(mesh)
        shard = batch_sharded(mesh)
        if k > 1:
            fn, shard = _scan_steps(fn, k, spd_unroll), stacked_batch_sharded(mesh)
        return jax.jit(fn, in_shardings=(repl, shard),
                       out_shardings=(repl, repl), donate_argnums=0,
                       compiler_options=co)

    if dp_mode == "shard_map":
        fn = partial(train_step, label_smooth=label_smooth,
                     axis_name=DATA_AXIS, augment_fn=augment_fn,
                     comm_dtype=comm_dtype)
        batch_spec = P(DATA_AXIS)
        if k > 1:
            # scan INSIDE the shard_map body: each replica scans its own
            # k per-replica sub-batches (stacked on the leading axis)
            fn, batch_spec = _scan_steps(fn, k, spd_unroll), P(None, DATA_AXIS)
        smapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(smapped, donate_argnums=0, compiler_options=co)

    raise ValueError(f"unknown dp_mode {dp_mode!r}")


def make_eval_step(mesh: Optional[Mesh] = None, dp_mode: str = "jit",
                   preprocess_fn: Optional[Callable] = None) -> Callable:
    if mesh is None:
        return jax.jit(partial(eval_step, preprocess_fn=preprocess_fn))
    if dp_mode == "jit":
        repl, shard = replicated(mesh), batch_sharded(mesh)
        return jax.jit(partial(eval_step, preprocess_fn=preprocess_fn),
                       in_shardings=(repl, shard), out_shardings=repl)
    if dp_mode == "shard_map":
        fn = partial(eval_step, axis_name=DATA_AXIS,
                     preprocess_fn=preprocess_fn)
        smapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(),
            check_vma=False)
        return jax.jit(smapped)
    raise ValueError(f"unknown dp_mode {dp_mode!r}")
