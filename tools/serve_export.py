#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

The deployment half of the reference workflow (train -> save_checkpoint ->
load_checkpoint in a serving process; SURVEY.md §3.4), TPU-native:
serializes the compiled inference program (StableHLO via jax.export,
weights baked in, uint8-in/logits-out, symbolic batch, cpu+tpu lowerings)
instead of a symbol-JSON + params pair that needs the framework at
serving time. See resnet_tpu/utils/serving.py.

    python tools/serve_export.py --out model_artifact \
        --preset imagenet_resnet50 --model-prefix ckpt/resnet \
        --load-epoch 90 [--serve-batch-size 8] [--platforms cpu tpu] [--check]

Serving then needs only jax:

    from resnet_tpu.utils.serving import load_serving   # or inline the
    serve, manifest = load_serving("model_artifact")    # 6-line loader
    logits = serve(u8_nhwc_batch)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True,
                   help="artifact prefix (writes <out>.stablehlo + <out>.json)")
    p.add_argument("--serve-batch-size", type=int, default=None,
                   help="pin the artifact batch dim (default: symbolic — "
                        "one artifact serves any batch size)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--serve-devices", type=int, default=1,
                   help="export the program batch-sharded over a 1-D "
                        "'data' mesh of N devices (the DP serving "
                        "layout); the artifact then requires exactly N "
                        "devices at load time")
    p.add_argument("--check", action="store_true",
                   help="after export, reload the artifact and verify its "
                        "logits match the live model on a random batch")
    p.add_argument("--no-symbol-config", action="store_true",
                   help="do NOT read model structure from {prefix}-symbol.json")
    args, rest = p.parse_known_args(argv)
    rest = [a for a in rest if a != "--"]

    import numpy as np

    from resnet_tpu.config import parse_config
    from resnet_tpu.train import checkpoint as ckpt
    from resnet_tpu.train.state import create_train_state
    from resnet_tpu.utils.serving import (export_serving, load_serving,
                                          make_serving_fn)

    cfg = parse_config(rest)
    if cfg.train.load_epoch is None:
        print("error: --load-epoch required", file=sys.stderr)
        return 2
    # the checkpoint pair carries its own graph (same rule as
    # tools/predict.py / mx.model.load_checkpoint)
    sym_json = f"{cfg.train.model_prefix}-symbol.json"
    if not args.no_symbol_config and os.path.exists(sym_json):
        from resnet_tpu.utils.symbol_export import config_from_symbol
        cfg = config_from_symbol(cfg, sym_json)
        print(f"# model config from {sym_json}: "
              f"{cfg.model.network}-{cfg.model.depth} v{cfg.model.version} "
              f"classes={cfg.data.num_classes}", file=sys.stderr)
    state = create_train_state(cfg)
    mx_params = (f"{cfg.train.model_prefix}"
                 f"-{cfg.train.load_epoch:04d}.params")
    if (not ckpt.has_epoch(cfg.train.model_prefix, cfg.train.load_epoch)
            and os.path.exists(mx_params)):
        from resnet_tpu.utils.export import load_mxnet_checkpoint
        params, stats = load_mxnet_checkpoint(
            cfg.train.model_prefix, cfg.train.load_epoch,
            state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=stats)
    else:
        state, _ = ckpt.load_checkpoint(cfg.train.model_prefix,
                                        cfg.train.load_epoch, state)

    artifact, manifest = export_serving(
        cfg, state.params, state.batch_stats, args.out,
        batch_size=args.serve_batch_size, platforms=args.platforms,
        num_devices=args.serve_devices)
    print(f"wrote {artifact} ({os.path.getsize(artifact) / 1e6:.1f} MB) "
          f"+ {manifest}")

    if args.check:
        serve, _ = load_serving(args.out)
        h, w, c = cfg.data.image_shape
        bs = args.serve_batch_size or 2 * args.serve_devices
        x = np.random.default_rng(0).integers(
            0, 256, (bs, h, w, c), dtype=np.uint8)
        got = np.asarray(serve(x))
        want = np.asarray(make_serving_fn(
            cfg, state.params, state.batch_stats)(x))
        err = float(np.max(np.abs(got - want)))
        print(f"check: artifact-vs-live max |dlogit| = {err:.2e}")
        if not np.allclose(got, want, atol=1e-3, rtol=1e-3):
            print("error: artifact logits diverge from the live model",
                  file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
