#!/usr/bin/env python
"""Input-pipeline benchmark: decode throughput + MEASURED end-to-end overhead.

Measures the north-star's second metric (input pipeline overhead < 5% of
step time — BASELINE.md): builds a synthetic RecordIO shard of real JPEGs,
then times the SAME jitted train step two ways:

  A) device-only — pre-staged device-resident batches (the compute ceiling);
  B) end-to-end — RecordIter (native decode pool) -> prefetch thread ->
     H2D -> step,

and reports ``overhead = t_B / t_A - 1`` via profiler.input_overhead,
plus raw native-decoder throughput (img/s and img/s/thread).

Interpretation on THIS box: 1 CPU core decodes ~650 img/s, so the overhead
is only <5% for step rates the single core can feed (pick --batch-size /
--depth so that decode_rate > step_rate * batch). On a real v5e host
(>100 cores) the same architecture feeds 3000+ img/s with the measured
per-core decode rate; the JSON includes the core count that requires.

    python tools/bench_input.py [--num-images 512] [--threads 4]
    python tools/bench_input.py --quick          # CPU smoke (tiny model)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))


def build_dataset(root: str, n: int, hw: int = 256) -> str:
    import numpy as np
    from PIL import Image

    from resnet_tpu.data.recordio import RecordIOWriter, pack_image_record
    rng = np.random.default_rng(0)
    prefix = os.path.join(root, "bench")
    with RecordIOWriter(prefix + ".rec", prefix + ".idx") as w:
        for i in range(n):
            # realistic JPEG entropy: smooth noise
            arr = rng.integers(0, 256, (hw // 8, hw // 8, 3), np.uint8)
            img = Image.fromarray(arr).resize((hw, hw), Image.BILINEAR)
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=90)
            w.write(pack_image_record(buf.getvalue(), float(i % 10),
                                      rec_id=i), key=i)
    return prefix


def measure_decode(prefix: str, threads: int, batch_size: int,
                   canvas: int) -> float:
    from resnet_tpu.data.native import NativeRecordLoader
    loader = NativeRecordLoader(prefix + ".rec", prefix + ".idx",
                                canvas_hw=(canvas, canvas), threads=threads)
    loader.begin_epoch(0, True, 0)
    loader.next_batch(batch_size)  # warm
    loader.begin_epoch(1, True, 0)
    tic = time.perf_counter()
    total = 0
    while True:
        imgs, _, _ = loader.next_batch(batch_size)
        total += len(imgs)
        if len(imgs) < batch_size:
            break
    dt = time.perf_counter() - tic
    loader.close()
    return total / dt


def main():
    from resnet_tpu.utils.platform import honor_jax_platforms
    honor_jax_platforms()
    p = argparse.ArgumentParser()
    p.add_argument("--num-images", type=int, default=512)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--steps", type=int, default=0,
                   help="timed steps per leg (0 = one epoch's worth)")
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"],
                   default="auto",
                   help="compute dtype; float32 slows the device leg so "
                        "the 1-core decode pool can feed it (overhead "
                        "demo needs decode_rate > step_rate * batch)")
    p.add_argument("--quick", action="store_true",
                   help="tiny model/shapes for CPU smoke-testing")
    p.add_argument("--decode-only", action="store_true",
                   help="skip the train-step legs (no device work)")
    p.add_argument("--interleave", type=int, default=0,
                   help="N>0: alternate device-only/end-to-end windows of "
                        "N steps instead of sequential legs — cancels the "
                        "machine's phase-to-phase step-time drift (several "
                        "percent on a busy host, larger than the 5%% "
                        "overhead target itself)")
    args = p.parse_args()

    if args.quick:
        args.num_images = min(args.num_images, 128)
        args.batch_size = 16
        args.depth = 18
        args.image_size = 64

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    prefix = build_dataset(tmp, args.num_images, max(args.image_size, 64))

    canvas = (args.image_size * 8 + 6) // 7 if args.image_size > 64 \
        else args.image_size

    # 1) raw decode throughput (the host-side ceiling)
    decode_rate = measure_decode(prefix, args.threads, args.batch_size,
                                 canvas)
    ncpu = os.cpu_count() or 1
    eff_cores = min(args.threads, ncpu)
    per_core = decode_rate / max(1, eff_cores)
    result = {
        "decode_imgs_per_sec": round(decode_rate, 1),
        "decode_imgs_per_sec_per_core": round(per_core, 1),
        "host_cores": ncpu,
        "threads": args.threads,
        "cores_needed_for_3000ips": round(3000 / max(per_core, 1e-9), 1),
    }

    if not args.decode_only:
        import jax

        from resnet_tpu.config import Config
        from resnet_tpu.data.loader import make_train_iter
        from resnet_tpu.data.prefetch import prefetch_to_device
        from resnet_tpu.ops import augment
        from resnet_tpu.train.state import create_train_state
        from resnet_tpu.train.steps import make_train_step
        from resnet_tpu.utils.profiler import input_overhead

        cfg = Config()
        cfg.model.depth = args.depth
        cfg.data.data_dir = tmp
        cfg.data.train_rec = "bench.rec"
        cfg.data.num_classes = 10
        cfg.data.image_shape = (args.image_size, args.image_size, 3)
        cfg.data.preprocess_threads = args.threads
        cfg.train.batch_size = args.batch_size
        cfg.train.dtype = args.dtype if args.dtype != "auto" else (
            "bfloat16" if jax.default_backend() == "tpu" else "float32")
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" \
            else jnp.float32
        out_hw = cfg.data.image_shape[:2]
        aug_fn = lambda imgs, rng, dims=None: augment.augment_imagenet(
            imgs, rng, cfg.data, out_hw, dtype, dims=dims)
        state = create_train_state(cfg)
        step_fn = make_train_step(mesh=None, augment_fn=aug_fn)

        train_iter = make_train_iter(cfg)
        steps = args.steps or train_iter.steps_per_epoch

        def run_epoch_through_pipeline(epoch: int, nsteps: int):
            n = 0
            for batch in prefetch_to_device(train_iter.epoch_iter(epoch),
                                            size=2):
                nonlocal state
                state, metrics = step_fn(state, batch)
                n += 1
                if n >= nsteps:
                    break
            float(metrics["count"])  # forced readback sync (axon quirk)
            return n

        # compile + warm both legs
        run_epoch_through_pipeline(0, 2)

        # Leg A pool: device-resident batches, rotated
        pool_host = []
        for i, b in enumerate(train_iter.epoch_iter(1)):
            pool_host.append(b)
            if i >= 3:
                break
        pool = [jax.device_put(b) for b in pool_host]
        jax.block_until_ready(pool)
        state, metrics = step_fn(state, pool[0])
        float(metrics["count"])

        if args.interleave:
            # Alternating windows: the same machine phase times both legs,
            # so step-time drift (thermal/allocator, measured at +-4-5% on
            # this box across phases — larger than the 5% target) cancels.
            win = args.interleave
            n_win = max(2, steps // win)

            def pipeline_windows():
                epoch = 2
                while True:
                    for b in prefetch_to_device(
                            train_iter.epoch_iter(epoch), size=2):
                        yield b
                    epoch += 1

            gen = pipeline_windows()
            next(gen)  # prime the producer
            t_device = t_e2e = 0.0
            for _ in range(n_win):
                tic = time.perf_counter()
                for i in range(win):
                    state, metrics = step_fn(state, pool[i % len(pool)])
                float(metrics["count"])
                t_device += time.perf_counter() - tic
                tic = time.perf_counter()
                for i in range(win):
                    state, metrics = step_fn(state, next(gen))
                float(metrics["count"])
                t_e2e += time.perf_counter() - tic
            t_device /= n_win * win
            t_e2e /= n_win * win
        else:
            # Sequential legs (the historical mode; subject to phase drift)
            tic = time.perf_counter()
            for i in range(steps):
                state, metrics = step_fn(state, pool[i % len(pool)])
            float(metrics["count"])
            t_device = (time.perf_counter() - tic) / steps

            # Leg B: full pipeline (decode pool -> prefetch -> H2D -> step)
            tic = time.perf_counter()
            n = run_epoch_through_pipeline(2, steps)
            t_e2e = (time.perf_counter() - tic) / max(n, 1)

        overhead = input_overhead(t_e2e, t_device)
        result.update({
            "step_ms_device_data": round(t_device * 1e3, 2),
            "step_ms_end_to_end": round(t_e2e * 1e3, 2),
            "input_overhead": round(overhead, 4),
            "input_overhead_target": 0.05,
            "host_fed_imgs_per_sec": round(args.batch_size / t_e2e, 1),
        })

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
