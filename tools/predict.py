#!/usr/bin/env python
"""Batch inference: classify images with a trained checkpoint.

Completes the reference user story (mx.model.load_checkpoint + Module
forward for deployment): point it at image files, a directory, or a .rec
shard; prints top-k classes per input as JSON lines.

    python tools/predict.py --preset imagenet_resnet50 \
        --model-prefix checkpoints/resnet --load-epoch 90 \
        --inputs img1.jpg img2.jpg [--top-k 5]
    python tools/predict.py ... --inputs val.rec --limit 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iter_inputs(paths, canvas_hw, limit):
    """Yield (name, uint8 canvas HWC) from files/dirs/rec shards."""
    import numpy as np
    from PIL import Image

    def load_image(p):
        img = Image.open(p).convert("RGB")
        w, h = img.size
        ch, cw = canvas_hw
        scale = max(ch / h, cw / w)
        rw, rh = max(cw, round(w * scale)), max(ch, round(h * scale))
        img = img.resize((rw, rh), Image.BILINEAR)
        x0, y0 = (rw - cw) // 2, (rh - ch) // 2
        return np.asarray(img)[y0:y0 + ch, x0:x0 + cw]

    count = 0
    for path in paths:
        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                if count >= limit:
                    return
                fp = os.path.join(path, f)
                if os.path.splitext(f)[1].lower() in (
                        ".jpg", ".jpeg", ".png", ".bmp"):
                    yield fp, load_image(fp)
                    count += 1
        elif path.endswith(".rec"):
            import io as _io
            from resnet_tpu.data.recordio import (RecordIOReader,
                                                  unpack_image_record)
            reader = RecordIOReader(path)
            for i, rec in enumerate(reader):
                if count >= limit:
                    return
                r = unpack_image_record(rec)
                img = Image.open(_io.BytesIO(r.image)).convert("RGB")
                import tempfile
                yield f"{path}#{i}", np.asarray(
                    img.resize(canvas_hw[::-1], Image.BILINEAR))
                count += 1
        else:
            if count >= limit:
                return
            yield path, load_image(path)
            count += 1


def main(argv=None):
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inputs", nargs="+", required=True,
                   help="image files, directories, or .rec shards")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--limit", type=int, default=1 << 30)
    p.add_argument("--no-symbol-config", action="store_true",
                   help="do NOT read the model structure from "
                        "{prefix}-symbol.json when it exists (by default "
                        "a foreign MXNet checkpoint pair configures the "
                        "network itself, like mx.model.load_checkpoint)")
    args, rest = p.parse_known_args(argv)
    rest = [a for a in rest if a != "--"]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnet_tpu.config import parse_config
    from resnet_tpu.models import get_model
    from resnet_tpu.ops.augment import normalize
    from resnet_tpu.train import checkpoint as ckpt
    from resnet_tpu.train.state import create_train_state

    cfg = parse_config(rest)
    if cfg.train.load_epoch is None:
        print("error: --load-epoch required", file=sys.stderr)
        return 2
    sym_json = f"{cfg.train.model_prefix}-symbol.json"
    if not args.no_symbol_config and os.path.exists(sym_json):
        # the checkpoint pair carries its own graph (SURVEY.md §3.4) —
        # read the network structure from it, exactly like
        # mx.model.load_checkpoint returning the symbol
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
        # reference-format checkpoint (mx.model.save_checkpoint binary):
        # predict straight from it — utils/mxnet_params.py shim
        from resnet_tpu.utils.export import load_mxnet_checkpoint
        params, stats = load_mxnet_checkpoint(
            cfg.train.model_prefix, cfg.train.load_epoch,
            state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=stats)
    else:
        state, _ = ckpt.load_checkpoint(cfg.train.model_prefix,
                                        cfg.train.load_epoch, state)
    hw = cfg.data.image_shape[:2]

    @jax.jit
    def infer(images_u8):
        x = normalize(images_u8, cfg.data.mean_rgb, cfg.data.std_rgb)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32))
        top = jnp.argsort(-probs, axis=-1)[:, :args.top_k]
        return top, jnp.take_along_axis(probs, top, axis=-1)

    names, imgs = [], []
    for name, img in _iter_inputs(args.inputs, hw, args.limit):
        names.append(name)
        imgs.append(img)
    if not imgs:
        print("error: no inputs found", file=sys.stderr)
        return 2
    batch = jnp.asarray(np.stack(imgs))
    top, probs = jax.device_get(infer(batch))
    for name, t, pr in zip(names, top, probs):
        print(json.dumps({
            "input": name,
            "top_k": [{"class": int(c), "prob": round(float(q), 5)}
                      for c, q in zip(t, pr)],
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
