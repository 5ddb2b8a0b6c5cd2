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

Two synchronization cadences (``--dp-sync``, the kvstore TRANSPORT
semantics analog — SURVEY.md §2d transport 2,
``mxnet:src/kvstore/kvstore_dist.cc`` ``dist_sync``/``dist_async``):
  - ``step``: gradients all-reduce every step — exact ``dist_sync`` /
    ``device`` / ``nccl`` semantics.
  - ``dispatch``: the TPU-native ``dist_async`` analog (local SGD /
    periodic parameter averaging). ps-lite's async transport exists to
    decouple workers from a slow network by tolerating bounded staleness;
    on TPU the idiomatic form of that trade is K un-synchronized local
    optimizer steps per dispatched program followed by ONE parameter-space
    ``pmean`` (params + momentum + BN stats) at the dispatch boundary —
    staleness is bounded by K (vs unbounded in ps-lite), comm drops from
    K gradient all-reduces to one state all-reduce per dispatch, and the
    reduction rides the SAME program (no host round-trip). Because the
    shipped optimizer's update is LINEAR in the gradient (mxnet_sgd,
    NAG, and the radial projection all are — train/optim.py), K=1
    dispatch-sync is mathematically identical to step-sync; K>1 is the
    throughput/staleness trade (tests/test_dp_sync.py pins both).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from resnet_tpu.ops.metrics import cross_entropy_loss, metric_sums
from resnet_tpu.parallel.mesh import (DATA_AXIS, batch_sharded, replicated,
                                      stacked_batch_sharded)
from resnet_tpu.train.state import TrainState


def train_step(state: TrainState, batch, label_smooth: float = 0.0,
               axis_name: Optional[str] = None,
               augment_fn: Optional[Callable] = None,
               comm_dtype=None, grad_sync: bool = True):
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

    if axis_name is not None and grad_sync:
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
    if axis_name is not None and grad_sync:
        metrics = jax.lax.psum(metrics, axis_name)
    return new_state, metrics


def sync_state(state: TrainState, axis_name: str) -> TrainState:
    """Parameter-space replica sync for ``dp_sync='dispatch'``.

    ``pmean`` every float leaf of (params, optimizer state, BN running
    stats) — the analog of ps-lite servers re-publishing merged weights
    (``mxnet:src/kvstore/kvstore_dist_server.h``), collapsed into one
    in-program collective. Momentum rides along so replicas re-enter the
    next local phase bit-identical (and so K=1 reproduces step-sync
    exactly — the MXNet update is linear in the gradient). Integer leaves
    (step / schedule counters) are replica-identical by construction and
    pass through untouched. Syncs stay f32: parameters are
    precision-critical, and one state-sized reduce per dispatch is already
    K x cheaper than the per-step gradient reduces it replaces.
    """
    def mean_floats(tree):
        return jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name)
            if jnp.issubdtype(x.dtype, jnp.inexact) else x, tree)

    return state.replace(params=mean_floats(state.params),
                         opt_state=mean_floats(state.opt_state),
                         batch_stats=mean_floats(state.batch_stats))


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
                    comm_dtype=None,
                    dp_sync: str = "step") -> Callable:
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

    ``dp_sync='dispatch'`` (shard_map only — GSPMD owns its own collective
    placement) runs the k in-program steps WITHOUT gradient all-reduces and
    issues one parameter-space ``sync_state`` pmean at the dispatch
    boundary instead: the ``dist_async`` analog (module docstring).
    """
    co = compiler_options or None
    k = steps_per_dispatch
    if k < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {k}")
    if dp_sync not in ("step", "dispatch"):
        raise ValueError(f"unknown dp_sync {dp_sync!r}")
    if dp_sync == "dispatch" and mesh is not None and dp_mode != "shard_map":
        # GSPMD infers collectives from shardings; there is no seam where a
        # "skip the grad reduce, pmean params later" schedule can be stated.
        raise ValueError("dp_sync='dispatch' requires --dp-mode shard_map")
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
        dispatch_sync = dp_sync == "dispatch"
        fn = partial(train_step, label_smooth=label_smooth,
                     axis_name=DATA_AXIS, augment_fn=augment_fn,
                     comm_dtype=comm_dtype, grad_sync=not dispatch_sync)
        batch_spec = P(DATA_AXIS)
        if k > 1:
            # scan INSIDE the shard_map body: each replica scans its own
            # k per-replica sub-batches (stacked on the leading axis)
            fn, batch_spec = _scan_steps(fn, k, spd_unroll), P(None, DATA_AXIS)
        if dispatch_sync:
            local = fn

            def fn(state, batch):
                # k local (un-reduced) steps, then ONE state pmean + the
                # deferred metric psum — all inside the same XLA program.
                state, ms = local(state, batch)
                return sync_state(state, DATA_AXIS), jax.lax.psum(ms, DATA_AXIS)
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
