#!/usr/bin/env python
"""Standalone validation — the reference's end-of-epoch ``score()`` as a
tool: load a checkpoint, run the eval pipeline, print the metric trio.

    python tools/validate.py --preset imagenet_resnet50 \
        --model-prefix checkpoints/resnet --load-epoch 90 \
        --data-dir /data/imagenet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    from resnet_tpu.config import parse_config
    from resnet_tpu.data.loader import make_val_iter
    from resnet_tpu.parallel.dist import maybe_init_distributed, proc_info
    from resnet_tpu.train.solver import Solver

    cfg = parse_config(argv)
    if cfg.train.load_epoch is None:
        print("error: --load-epoch is required", file=sys.stderr)
        return 2
    maybe_init_distributed()
    num_parts, part_index = proc_info()
    solver = Solver(cfg)
    state = solver.init_state()
    val_iter = make_val_iter(cfg, num_parts, part_index)
    if val_iter is None:
        print("error: no validation data for this pipeline",
              file=sys.stderr)
        return 2
    m = solver.validate(state, val_iter, cfg.train.load_epoch)
    print({k: round(v, 6) for k, v in m.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
