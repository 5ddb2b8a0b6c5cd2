"""Name-mapped parameter export in the reference's naming convention.

SURVEY.md §5 (checkpoint/resume): the reference saves a flat
``name -> NDArray`` dict (``arg_params`` weights + ``aux_params`` BN running
stats) with MXNet symbol names like ``stage1_unit1_conv1_weight``,
``..._bn1_gamma/beta`` and aux ``..._bn1_moving_mean/moving_var``
(ref: mx.model.save_checkpoint / symbol name scopes in ref:symbol/resnet.py).
This module maps our flax tree to/from those names so side-by-side parity
checks against an MXNet-trained model are mechanical.

Layout conversion: flax conv kernels are HWIO (NHWC models); MXNet stores
OIHW. Dense: flax (in, out) -> MXNet (out, in).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np


def _mx_name(path: Tuple[str, ...]) -> Tuple[str, str, bool]:
    """flax path -> (mxnet name, kind, is_aux). kind in {conv, bn, fc}."""
    *scope, leaf = path
    prefix = "_".join(scope) if scope else ""
    mod = scope[-1] if scope else ""
    if leaf == "kernel" and mod == "fc":
        return "fc1_weight", "fc", False
    if leaf == "bias" and mod == "fc":
        return "fc1_bias", "fc", False
    if leaf == "kernel":
        return f"{prefix}_weight", "conv", False
    if leaf == "scale":
        return f"{prefix}_gamma", "bn", False
    if leaf == "bias":
        return f"{prefix}_beta", "bn", False
    if leaf == "mean":
        return f"{prefix}_moving_mean", "bn", True
    if leaf == "var":
        return f"{prefix}_moving_var", "bn", True
    raise KeyError(f"unmapped leaf {path}")


def export_mxnet_params(params, batch_stats) -> Tuple[Dict[str, np.ndarray],
                                                      Dict[str, np.ndarray]]:
    """-> (arg_params, aux_params) flat dicts, MXNet names + layouts."""
    args: Dict[str, np.ndarray] = {}
    auxs: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        name, kind, _ = _mx_name(keys)
        arr = np.asarray(leaf)
        if kind == "conv" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)      # HWIO -> OIHW
        elif kind == "fc" and arr.ndim == 2:
            arr = arr.T                          # (in,out) -> (out,in)
        args[name] = arr
    for path, leaf in jax.tree_util.tree_leaves_with_path(batch_stats):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        name, _, _ = _mx_name(keys)
        auxs[name] = np.asarray(leaf)
    return args, auxs


def import_mxnet_params(args: Dict[str, np.ndarray],
                        auxs: Dict[str, np.ndarray], params, batch_stats):
    """Inverse mapping: fill a flax tree template from MXNet-named dicts."""
    def fill(tree, table, aux):
        flat = jax.tree_util.tree_leaves_with_path(tree)
        out = []
        for path, leaf in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            name, kind, _ = _mx_name(keys)
            arr = np.asarray(table[name])
            if not aux and kind == "conv" and arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif not aux and kind == "fc" and arr.ndim == 2:
                arr = arr.T
            assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
            out.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), out)

    return fill(params, args, False), fill(batch_stats, auxs, True)


def save_mxnet_style(path_prefix: str, epoch: int, params,
                     batch_stats, fmt: str = "npz") -> str:
    """Write the reference's checkpoint layout.

    ``fmt="params"``: a REAL ``{prefix}-{epoch:04d}.params`` in MXNet's
    dmlc NDArray-list binary format (utils/mxnet_params.py) — loadable by
    ``mx.nd.load``/``mx.model.load_checkpoint`` on the MXNet side.
    ``fmt="npz"`` (default): the same flat arg:/aux: dict as a .npz shim.
    """
    args, auxs = export_mxnet_params(params, batch_stats)
    if fmt == "params":
        from resnet_tpu.utils.mxnet_params import save_params
        out = f"{path_prefix}-{epoch:04d}.params"
        save_params(out, args, auxs)
        return out
    flat = {f"arg:{k}": v for k, v in args.items()}
    flat.update({f"aux:{k}": v for k, v in auxs.items()})
    out = f"{path_prefix}-{epoch:04d}.params.npz"
    np.savez(out, **flat)
    return out


def load_mxnet_checkpoint(path_prefix: str, epoch: int, params,
                          batch_stats):
    """Resume FROM a reference checkpoint: read
    ``{prefix}-{epoch:04d}.params`` (the MXNet binary written by
    ``mx.model.save_checkpoint`` — or by :func:`save_mxnet_style`
    ``fmt="params"``) and fill our flax param/batch-stats templates.
    The reference does not checkpoint optimizer state (SURVEY.md §3.4
    quirk), so momentum restarts at zero exactly as an MXNet resume does.
    """
    from resnet_tpu.utils.mxnet_params import load_params
    args, auxs = load_params(f"{path_prefix}-{epoch:04d}.params")
    return import_mxnet_params(args, auxs, params, batch_stats)
