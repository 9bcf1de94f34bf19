#!/usr/bin/env python3
"""Training-step throughput for YOLOX-M-P6 on the real chip.

The reference trains on 4xA100 at global batch 64 (ref README.md:33-40);
this measures the single-chip jitted train step (fwd + SimOTA + loss + bwd
+ SGD + EMA) img/s so the pod-level projection (PARALLELISM.md recipe:
DP over ICI, near-linear for this 25M-param CNN) has a measured anchor.

Usage: python tools/bench_train.py [-b 16] [--size 640] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def main():
    ap = argparse.ArgumentParser("bench_train")
    ap.add_argument("-b", "--batch-size", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max-labels", type=int, default=50)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the model forward (memory-bound "
                         "operating points, e.g. b128@640 with G=120)")
    ap.add_argument("--simota-bf16", action="store_true",
                    help="bf16 SimOTA cost matrices (assignment-only "
                         "approximation — ops/simota.py)")
    ap.add_argument("--loader", metavar="DATA_DIR", default=None,
                    help="end-to-end mode: pull real batches through "
                         "exp.get_data_loader + DevicePrefetcher and "
                         "measure steady-state img/s INCLUDING the input "
                         "stage (decode on host workers; aug per "
                         "--pipeline)")
    ap.add_argument("--pipeline",
                    choices=["host", "device-aug", "device-mosaic"],
                    default="device-mosaic",
                    help="where the train augmentation runs in --loader "
                         "mode (device-mosaic = host keeps decode+RNG "
                         "only)")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from cocodet_tpu.core.train_state import (create_train_state,
                                              make_train_step)
    from cocodet_tpu.models import build_model

    model = build_model("yolox-p6", depth=args.depth, width=args.width,
                        dtype=getattr(jnp, args.dtype))

    def decay_mask(params):
        flat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict(
            {k: (k[-1] == "kernel") for k in flat})

    tx = optax.chain(
        optax.add_decayed_weights(5e-4, mask=decay_mask),
        optax.sgd(0.01, momentum=0.9, nesterov=True),
    )

    rng = jax.random.PRNGKey(0)
    b, s = args.batch_size, args.size

    if args.loader:
        _bench_with_loader(args, model, tx, rng)
        return

    imgs = jnp.asarray(np.random.RandomState(0).rand(b, s, s, 3) * 255,
                       jnp.float32)
    # realistic label density: ~8 boxes/img (COCO mean ~7.3), padded
    rs = np.random.RandomState(1)
    labels = np.zeros((b, args.max_labels, 5), np.float32)
    for i in range(b):
        n = rs.randint(3, 15)
        labels[i, :n, 0] = rs.randint(0, 80, n)
        labels[i, :n, 1:3] = rs.uniform(64, s - 64, (n, 2))
        labels[i, :n, 3:5] = rs.uniform(16, 128, (n, 2))
    labels = jnp.asarray(labels)

    state = create_train_state(model, tx, rng, imgs[:1])
    step = make_train_step(model, tx, strides=(8, 16, 32, 64),
                           num_classes=80, remat=args.remat,
                           simota_bf16=args.simota_bf16)

    # Sync discipline: under this TPU's remote tunnel,
    # jax.block_until_ready() can return before the device actually
    # executes (non-0-d outputs are lazy remote handles), which once
    # produced impossible >1 PFLOP/s "measurements". A host readback of a
    # scalar (float(...)) is the only trustworthy barrier; the steps
    # themselves chain through `state`, so one readback at the end forces
    # every step to have executed.
    t0 = time.perf_counter()
    state, metrics = step(state, imgs, labels, use_l1=False)
    _ = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, imgs, labels, use_l1=False)
    loss = float(metrics["loss"])  # forces the whole chain
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt * 1e3:.1f} ms/step @ b{b}/{s}px "
          f"({b / dt:.1f} img/s, loss={loss:.3f})")


def _bench_with_loader(args, model, tx, rng):
    """End-to-end steady-state throughput: real DetectionLoader (host
    decode workers) -> DevicePrefetcher (async H2D) -> on-device aug
    programs (per --pipeline) -> jitted train step.  This is EXACTLY the
    Trainer's production input path (core/trainer.py _next_batch uses the
    same apply_device_preproc), so the number answers "what does one chip
    sustain including input?" rather than the step-only upper bound.

    Sync discipline: the steps chain through `state` and the loop ends
    with a host scalar readback, the only trustworthy barrier under this
    TPU's remote tunnel (see main()).
    """
    from cocodet_tpu.core.train_state import (create_train_state,
                                              make_train_step)
    from cocodet_tpu.data.device_aug import apply_device_preproc
    from cocodet_tpu.data.samplers import DevicePrefetcher
    from cocodet_tpu.exp import get_exp

    b, s = args.batch_size, args.size
    exp = get_exp(exp_name="yolox-m-p6")
    exp.depth, exp.width = args.depth, args.width
    exp.data_dir = args.loader
    exp.input_size = exp.test_size = (s, s)
    exp.multiscale_range = 0
    exp.data_num_workers = args.workers
    exp.mosaic_prob = 1.0
    exp.enable_mixup = True
    exp.device_aug = args.pipeline in ("device-aug", "device-mosaic")
    exp.device_mosaic = args.pipeline == "device-mosaic"

    loader = exp.get_data_loader(b, seed=0)
    prefetcher = DevicePrefetcher(loader)

    def next_batch():
        imgs, labels, _, _ = prefetcher.next()
        if isinstance(imgs, dict):
            imgs, labels = apply_device_preproc(exp, (s, s), imgs)
        return imgs, labels

    imgs, labels = next_batch()
    state = create_train_state(model, tx, rng, imgs[:1])
    step = make_train_step(model, tx, strides=(8, 16, 32, 64),
                           num_classes=exp.num_classes, remat=args.remat,
                           simota_bf16=args.simota_bf16)

    t0 = time.perf_counter()
    state, metrics = step(state, imgs, labels, use_l1=False)
    _ = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    # second step compiles nothing new -> from here on it's steady state
    state, metrics = step(state, *next_batch(), use_l1=False)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, *next_batch(), use_l1=False)
    loss = float(metrics["loss"])  # forces the whole chain
    dt = (time.perf_counter() - t0) / args.iters
    print(f"end-to-end [{args.pipeline}, {args.workers}w]: "
          f"{dt * 1e3:.1f} ms/step @ b{b}/{s}px "
          f"({b / dt:.1f} img/s, loss={loss:.3f})")


if __name__ == "__main__":
    main()
