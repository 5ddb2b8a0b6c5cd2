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
  - can be exported SHARDED (``num_devices=N``): the batch dimension is
    partitioned over a 1-D ``data`` mesh — the serving-side mirror of
    the training DP layout (SURVEY.md §2c), so one artifact feeds a
    whole inference pod with XLA inserting any collectives;
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


def _batch_repr(batch_size, num_devices):
    """Manifest spelling of the batch dim: pinned int, or the symbolic
    'b' / 'N*b' (sharded artifacts accept any multiple of N)."""
    if batch_size is not None:
        return int(batch_size)
    return "b" if num_devices == 1 else f"{num_devices}*b"


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
                   num_devices: int = 1,
                   ) -> Tuple[str, str]:
    """Export the inference program; returns (artifact_path, manifest_path).

    ``batch_size=None`` exports a symbolic batch dimension ``b`` (any
    batch size at call time); an int pins it (slightly cheaper compiles
    on fixed-shape serving fleets).

    ``num_devices=N`` exports the program batch-sharded over a 1-D
    ``data`` mesh of N devices — the serving mirror of the training DP
    layout. The symbolic batch becomes ``N*b`` (any multiple of N); a
    pinned ``batch_size`` must divide by N. The artifact then requires
    exactly N devices at load time (``load_serving`` re-stages plain
    host arrays onto the mesh automatically).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    serve = make_serving_fn(cfg, params, batch_stats)
    h, w, c = cfg.data.image_shape
    if num_devices > 1:
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        if len(jax.devices()) < num_devices:
            raise ValueError(f"sharded export needs {num_devices} devices "
                             f"visible at trace time, have "
                             f"{len(jax.devices())}")
        mesh = Mesh(np.array(jax.devices()[:num_devices]), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        if batch_size is None:
            b = jexport.symbolic_shape(f"{num_devices}*b")[0]
        else:
            b = int(batch_size)
            if b % num_devices:
                raise ValueError(f"batch_size {b} must divide by "
                                 f"num_devices {num_devices}")
        spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8,
                                    sharding=sharding)
        jitted = jax.jit(serve, in_shardings=sharding,
                         out_shardings=sharding)
    else:
        if batch_size is None:
            b = jexport.symbolic_shape("b")[0]
        else:
            b = int(batch_size)
        spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.uint8)
        jitted = jax.jit(serve)
    exported = jexport.export(jitted, platforms=tuple(platforms))(spec)

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
        "num_devices": num_devices,
        "sharding": (f"batch dim over a 1-D 'data' mesh of {num_devices} "
                     "devices" if num_devices > 1 else "replicated "
                     "(single device)"),
        "input": {
            "shape": [_batch_repr(batch_size, num_devices), h, w, c],
            "dtype": "uint8",
            "layout": "NHWC",
            "preprocessing": "none (mean/std normalize is inside the "
                             "program); feed raw center-cropped canvases",
        },
        "output": {"shape": [_batch_repr(batch_size, num_devices),
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
    (the artifact is the whole model). For a sharded artifact
    (``exported.nr_devices > 1``) plain host arrays are re-staged onto
    a 1-D mesh over the first N local devices before the call — the
    same batch-sharded layout the program was exported with."""
    import jax
    from jax import export as jexport

    with open(out_prefix + ".stablehlo", "rb") as f:
        exported = jexport.deserialize(f.read())
    manifest = {}
    if os.path.exists(out_prefix + ".json"):
        with open(out_prefix + ".json") as f:
            manifest = json.load(f)

    if exported.nr_devices == 1:
        return exported.call, manifest

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    n = exported.nr_devices
    if len(jax.devices()) < n:
        raise ValueError(f"artifact was exported for {n} devices; "
                         f"{len(jax.devices())} visible")
    sharding = NamedSharding(Mesh(np.array(jax.devices()[:n]), ("data",)),
                             P("data"))

    def serve(images_u8):
        if not (isinstance(images_u8, jax.Array)
                and images_u8.sharding == sharding):
            images_u8 = jax.device_put(images_u8, sharding)
        return exported.call(images_u8)

    return serve, manifest
