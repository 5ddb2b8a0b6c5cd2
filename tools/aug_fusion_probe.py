#!/usr/bin/env python
"""Single-chip probe: where the augmentation->stem boundary spends its time.

Round-4 question (VERDICT r3 next-step #1): the Pallas augmenter emits a
(N,224,224,3) tensor that the space-to-depth stem immediately regroups into
(N,112,112,12); with the photometric jitters on (the shipped preset: HSL
36/50/50) the kernel additionally emits FLOAT32 and an XLA epilogue
(HSL -> normalize -> bf16 cast) re-reads it. Two candidate traffic cuts:

  1. emit the crop-resize directly in s2d block layout (delete the stem's
     regroup transpose) — only worth building if the transpose is a
     SEPARATE copy in the compiled program rather than fused into the
     epilogue;
  2. fuse the photometric jitters into the Pallas kernel (delete the f32
     intermediate round-trip entirely: ~77 MB write + 77 MB read at bs128).

This probe compiles mini-programs on the real chip and reports (a) the
optimized-HLO structure between the aug custom-call and the stem conv
(transpose/copy/fusion inventory with byte sizes) and (b) wall-clock
timings that bound each candidate's win (note A-B includes the stem conv):

  A  pallas aug (photometric split: kernel f32 -> XLA HSL+norm) + s2d stem conv
  B  pallas crop only (identity norm, f32 out)  [A - B ~= epilogue cost]
  C  xla aug + s2d stem conv                     [XLA-lowering anchor]

Usage: python tools/aug_fusion_probe.py [--batch-size 128] [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def hlo_boundary_report(txt: str) -> dict:
    """Inventory transposes/copies/fusions in the entry computation."""
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1).splitlines() if m else txt.splitlines()
    from tools.pod_compile_probe import shape_bytes
    inv = []
    for ln in body:
        ls = ln.strip()
        if "=" not in ls:
            continue
        for op in ("transpose(", "copy(", "fusion(", "custom-call(",
                   "convolution(", "bitcast("):
            if f" {op}" in ls:
                res = ls.split("=", 1)[1].split(op.rstrip("("))[0]
                kind = op.rstrip("(")
                # fusion kind annotation, if present
                fk = ""
                mk = re.search(r"kind=(\w+)", ls)
                if mk:
                    fk = mk.group(1)
                inv.append({"op": kind, "kind": fk,
                            "bytes": shape_bytes(res)})
                break
    return {
        "n_instructions": len(inv),
        "transposes": [x for x in inv if x["op"] == "transpose"],
        "copies": [x for x in inv if x["op"] == "copy"],
        "big_fusions": sorted(
            [x for x in inv if x["op"] == "fusion"
             and x["bytes"] > 8 << 20],
            key=lambda x: -x["bytes"])[:12],
        "custom_calls": len([x for x in inv if x["op"] == "custom-call"]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from resnet_tpu.config import imagenet_resnet50
    from resnet_tpu.data.pipeline import canvas_size
    from resnet_tpu.ops import augment
    from resnet_tpu.ops.augment_pallas import (augment_imagenet_pallas,
                                               fused_crop_mirror_normalize)
    from resnet_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    cfg = imagenet_resnet50()
    d = cfg.data
    bs = args.batch_size
    h, w, c = d.image_shape
    ch, cw = canvas_size((h, w))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (bs, ch, cw, c), dtype=np.uint8))
    dims = jnp.broadcast_to(
        jnp.asarray([ch, cw, ch, cw], jnp.int32), (bs, 4))
    key = jax.random.key(7)
    kern = jnp.asarray(
        rng.normal(0, 0.05, (7, 7, c, 64)), jnp.float32)

    def s2d_stem(x, kernel):
        # exact copy of models/resnet._StemConvS2D math (probe-local)
        n, hh, ww, cc = x.shape
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = (k.reshape(4, 2, 4, 2, cc, 64)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * cc, 64))
        x = (x.reshape(n, hh // 2, 2, ww // 2, 2, cc)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, hh // 2, ww // 2, 4 * cc))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def prog_a(imgs, dims, key, kernel):
        x = augment_imagenet_pallas(imgs, key, d, (h, w), jnp.bfloat16,
                                    dims=dims)
        y = s2d_stem(x, kernel)
        return y.astype(jnp.float32).sum()

    def prog_b(imgs, dims, key):
        # crop only (the kernel's photometric branch first stage)
        from resnet_tpu.ops.augment import sample_boxes_canvas
        r_box, r_mir, r_hsl = jax.random.split(key, 3)
        boxes = sample_boxes_canvas(r_box, d, bs, ch, cw, (h, w), dims)
        flip = jax.random.bernoulli(r_mir, 0.5, (bs,))
        x = fused_crop_mirror_normalize(
            imgs, boxes, flip, (h, w), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
            jnp.float32, valid_hw=(dims[:, 2], dims[:, 3]))
        return x.sum()

    def prog_c(imgs, dims, key, kernel):
        x = augment.augment_imagenet(imgs, key, d, (h, w), jnp.bfloat16,
                                     dims=dims)
        y = s2d_stem(x, kernel)
        return y.astype(jnp.float32).sum()

    report = {"batch_size": bs, "canvas": (ch, cw)}
    progs = {
        "A_pallas_aug_plus_s2d_stem": (prog_a, (imgs, dims, key, kern)),
        "B_pallas_crop_only": (prog_b, (imgs, dims, key)),
        "C_xla_aug_plus_s2d_stem": (prog_c, (imgs, dims, key, kern)),
    }
    for name, (fn, fargs) in progs.items():
        jitted = jax.jit(fn)
        tic = time.perf_counter()
        compiled = jitted.lower(*fargs).compile()
        compile_s = time.perf_counter() - tic
        try:
            hlo = compiled.as_text()
            bound = hlo_boundary_report(hlo)
        except Exception as e:
            bound = {"hlo_error": repr(e)}
        for _ in range(args.warmup):
            out = compiled(*fargs)
        float(out)   # forced readback sync
        tic = time.perf_counter()
        for _ in range(args.steps):
            out = compiled(*fargs)
        float(out)
        ms = (time.perf_counter() - tic) / args.steps * 1e3
        report[name] = {"ms_per_call": round(ms, 3),
                        "compile_s": round(compile_s, 1), **bound}
        print(f"# {name}: {ms:.3f} ms/call", file=sys.stderr)

    report["epilogue_ms_estimate(A-B)"] = round(
        report["A_pallas_aug_plus_s2d_stem"]["ms_per_call"]
        - report["B_pallas_crop_only"]["ms_per_call"], 3)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
