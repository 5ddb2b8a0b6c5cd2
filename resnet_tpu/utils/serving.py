"""TPU-native serving export: self-contained StableHLO inference artifacts.

Rebuilds the reference's deployment story (ref: ``mx.model.save_checkpoint``'s
``prefix-symbol.json`` + ``prefix-NNNN.params`` pair, consumed at serving
time by ``mx.model.load_checkpoint`` + ``Module.bind(for_training=False)``
— SURVEY.md §3.4) the TPU way: instead of a graph JSON plus a weight dict
that needs the whole framework to re-assemble the network, ``jax.export``
serializes the traced inference PROGRAM (versioned StableHLO) with the
trained weights baked in as constants. The resulting artifact

  - takes raw uint8 NHWC canvases — the mean/std normalize is folded
    INSIDE the program, so host->device moves 1 byte/pixel, the same
    transfer boundary the training pipeline uses;
  - has a SYMBOLIC batch dimension by default (one artifact serves any
    batch size) via jax.export shape polymorphism;
  - is lowered for BOTH ``cpu`` and ``tpu`` backends in one file;
  - loads and runs under any compatible JAX install WITHOUT resnet_tpu
    on the path (StableHLO carries jax.export's forward-compatibility
    guarantees), unlike the reference pair which requires MXNet.

Files written: ``<out>.stablehlo`` (the serialized artifact) and
``<out>.json`` (manifest: model family/depth/classes, canvas shape,
normalize constants, calling convention, jax version).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

MANIFEST_VERSION = 1


def make_serving_fn(cfg, params, batch_stats) -> Callable:
    """uint8 NHWC canvases -> float32 logits (inference mode, running-stats
    BN) — the same compiled path tools/predict.py serves interactively."""
    import jax.numpy as jnp

    from resnet_tpu.models import get_model
    from resnet_tpu.ops.augment import normalize

    model = get_model(cfg)
    mean, std = cfg.data.mean_rgb, cfg.data.std_rgb

    def serve(images_u8):
        x = normalize(images_u8, mean, std, dtype=model.dtype)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return logits.astype(jnp.float32)

    return serve


def export_serving(cfg, params, batch_stats, out_prefix: str,
                   batch_size: Optional[int] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   ) -> Tuple[str, str]:
    """Export the inference program; returns (artifact_path, manifest_path).

    ``batch_size=None`` exports a symbolic batch dimension ``b`` (any
    batch size at call time); an int pins it (slightly cheaper compiles
    on fixed-shape serving fleets).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    serve = make_serving_fn(cfg, params, batch_stats)
    h, w, c = cfg.data.image_shape
    if batch_size is None:
        b = jexport.symbolic_shape("b")[0]
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8)
    exported = jexport.export(jax.jit(serve),
                              platforms=tuple(platforms))(spec)

    artifact = out_prefix + ".stablehlo"
    manifest_path = out_prefix + ".json"
    with open(artifact, "wb") as f:
        f.write(exported.serialize())
    manifest = {
        "manifest_version": MANIFEST_VERSION,
        "format": "jax.export StableHLO",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "network": cfg.model.network,
        "depth": cfg.model.depth,
        "version": cfg.model.version,
        "num_classes": cfg.data.num_classes,
        "input": {
            "shape": ["b" if batch_size is None else batch_size, h, w, c],
            "dtype": "uint8",
            "layout": "NHWC",
            "preprocessing": "none (mean/std normalize is inside the "
                             "program); feed raw center-cropped canvases",
        },
        "output": {"shape": ["b" if batch_size is None else batch_size,
                             cfg.data.num_classes],
                   "dtype": "float32", "semantics": "logits"},
        "normalize": {"mean_rgb": list(cfg.data.mean_rgb),
                      "std_rgb": list(cfg.data.std_rgb)},
        "compute_dtype": cfg.train.dtype,
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return artifact, manifest_path


def load_serving(out_prefix: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load an exported artifact; returns (callable, manifest).

    The callable takes a uint8 NHWC array and returns float32 logits.
    Needs only jax — deliberately imports nothing else from resnet_tpu
    (the artifact is the whole model)."""
    from jax import export as jexport

    with open(out_prefix + ".stablehlo", "rb") as f:
        exported = jexport.deserialize(f.read())
    manifest = {}
    if os.path.exists(out_prefix + ".json"):
        with open(out_prefix + ".json") as f:
            manifest = json.load(f)
    return exported.call, manifest
