"""Checkpoint save/resume via orbax — epoch-granular like the reference,
strictly richer in content.

Reference behaviour being rebuilt (SURVEY.md §3.4): ``do_checkpoint(prefix)``
writes ``prefix-symbol.json`` + ``prefix-NNNN.params`` (weights + BN aux
states) at each epoch end; resume loads ``--load-epoch N`` and restarts the
fit loop at ``begin_epoch=N``. MXNet does NOT checkpoint optimizer momentum —
we do (momentum, schedule step, PRNG state, and the data-iterator state), so
resume is bit-exact rather than "close enough".

Layout: ``{model_prefix}/{epoch}/`` orbax PyTree checkpoints; the epoch
number is the orbax step, mirroring the reference's NNNN suffix.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from resnet_tpu.train.state import TrainState


_align_count = 0


def _align(tag: str) -> None:
    """Coordination-service barrier before every orbax entry point.

    Orbax's multi-process operations run gloo allgathers internally, and
    XLA:CPU gloo contexts give the other ranks only ~30s to show up at
    creation — less than the scheduling starvation bursts a contended
    host can produce between two checkpoint calls. All ranks make the
    SAME sequence of checkpoint calls (the Solver's overwrite bookkeeping
    depends on that already), so a counted barrier here keeps them
    aligned wherever a collective might be created. No-op single-process.
    """
    global _align_count
    _align_count += 1
    from resnet_tpu.parallel.dist import barrier

    barrier(f"resnet_tpu:ckpt:{tag}:{_align_count}")


def _manager(model_prefix: str, max_to_keep: Optional[int] = None):
    path = os.path.abspath(model_prefix)
    os.makedirs(path, exist_ok=True)
    return ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True))


def save_checkpoint(model_prefix: str, epoch: int, state: TrainState,
                    iter_state: Optional[dict] = None,
                    max_to_keep: Optional[int] = None,
                    force: bool = False) -> None:
    """Epoch-end save (ref: epoch_end_callback do_checkpoint).

    ``force`` overwrites an existing step — mid-epoch saves
    (``--checkpoint-frequent`` / SIGTERM) reuse the completed-epoch count
    as their step and carry the intra-epoch progress in ``iter_state``,
    so successive saves within one epoch land on the same step number.
    Orbax cannot replace a step in place (its ``force`` only bypasses
    should_save), so overwrite = delete + save; a crash in that window
    falls back to the previous epoch-boundary checkpoint — still no worse
    than the reference, which only ever has epoch granularity.

    Multi-process rule: orbax ``delete`` ends in a COLLECTIVE barrier, so
    every rank must call it or none — ``force`` must therefore come from
    rank-deterministic state (the Solver's saved-steps schedule), never
    from a per-rank filesystem peek (an ``all_steps()`` race deadlocked a
    4-process run against this barrier). The race-free single-process
    case keeps an FS fallback for steps left by older runs.
    """
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }
    _align("save")
    with _manager(model_prefix, max_to_keep) as mgr:
        if not force and jax.process_count() == 1 \
                and epoch in mgr.all_steps():
            force = True
        if force:
            try:
                mgr.delete(epoch)
            except FileNotFoundError:
                # consistent across ranks: a finalized step dir is either
                # visible to every rank or to none, so all ranks raise
                # (or none does) before orbax's internal barrier
                pass
        mgr.save(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            iter_state=ocp.args.JsonSave(iter_state or {})),
            force=True)   # bypass should_save only; never overwrites
        mgr.wait_until_finished()


def load_checkpoint(model_prefix: str, epoch: int,
                    state: TrainState) -> Tuple[TrainState, dict]:
    """Resume (ref:train_resnet.py load_epoch → mx.model.load_checkpoint).

    ``state`` provides the target pytree structure (like binding the symbol
    before loading params in MXNet).
    """
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    _align("load")
    with _manager(model_prefix) as mgr:
        restored = mgr.restore(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract),
            iter_state=ocp.args.JsonRestore()))
    st = restored["state"]
    new_state = state.replace(
        step=st["step"], params=st["params"],
        batch_stats=st["batch_stats"], opt_state=st["opt_state"],
        rng=st["rng"])
    return new_state, restored["iter_state"] or {}


def has_epoch(model_prefix: str, epoch: int) -> bool:
    """True if an orbax checkpoint for ``epoch`` exists under the prefix.

    A plain directory probe (orbax lays out ``{prefix}/{epoch}/``) — no
    collective, so callers can use it to CHOOSE a loader (orbax vs the
    MXNet .params shim) before entering orbax's barriers.
    """
    return os.path.isdir(
        os.path.join(os.path.abspath(model_prefix), str(epoch)))


def latest_epoch(model_prefix: str) -> Optional[int]:
    path = os.path.abspath(model_prefix)
    if not os.path.isdir(path):
        return None
    _align("latest")
    with _manager(model_prefix) as mgr:
        return mgr.latest_step()
