#!/usr/bin/env python
"""Convert an orbax checkpoint to the reference's checkpoint pair.

    python tools/export_mxnet.py --out /tmp/export/model -- \
        <train_resnet.py config flags> --model-prefix ck --load-epoch 30

Writes ``{out}-symbol.json`` (NNVM graph, utils/symbol_export.py) and
``{out}-{epoch:04d}.params`` (dmlc NDArray-list binary,
utils/mxnet_params.py) — the exact file pair
``mx.model.save_checkpoint`` produces, loadable with
``mx.model.load_checkpoint`` on the MXNet side (SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()

    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--out", required=True,
                   help="output prefix for the -symbol.json/.params pair")
    args, rest = p.parse_known_args(argv)

    from resnet_tpu.config import parse_config
    from resnet_tpu.train import checkpoint as ckpt
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.export import save_mxnet_style
    from resnet_tpu.utils.symbol_export import save_symbol

    cfg = parse_config(rest)
    if cfg.train.load_epoch is None:
        print("error: --load-epoch required", file=sys.stderr)
        return 2
    state = create_train_state(cfg)
    state, _ = ckpt.load_checkpoint(cfg.train.model_prefix,
                                    cfg.train.load_epoch, state)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    sym = save_symbol(args.out, cfg)
    params = save_mxnet_style(args.out, cfg.train.load_epoch, state.params,
                              state.batch_stats, fmt="params")
    print(sym)
    print(params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
