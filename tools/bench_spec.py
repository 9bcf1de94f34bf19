#!/usr/bin/env python3
"""Throughput + latency percentiles for ONE deployment artifact spec.

Complements bench.py (fixed headline recipe) with the frontier-table /
operating-point measurements VERDICT r4 items 1 and 5 ask for:

- any pipeline chain's ``pipe_slim_spec.json`` at any (depth, width);
- any (img size, batch) operating point — e.g. the reference's winning
  832/b16 configuration (ref choijhanyangackr/config/
  yolox_m_p6_sparse.json:2-27: img 832, batch 16, conf 0.001, nms 0.55);
- bf16 vs w8a8 on the SAME spec (the apples-to-apples quant A/B);
- p50/p99 per-image latency (BASELINE.json's tertiary metric): each
  timed iteration blocks on host readback of a device scalar, so the
  percentile distribution is true end-to-end device latency per batch,
  not pipelined throughput.

Prints one JSON line:
  {"spec", "depth", "width", "size", "batch", "quant",
   "img_s", "p50_ms_img", "p99_ms_img", "ms_batch_p50"}

Model construction runs on the host CPU backend so the TPU tunnel sees
exactly one compiled program (same discipline as bench.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    ap = argparse.ArgumentParser("bench_spec")
    ap.add_argument("--spec", default=None,
                    help="pipe_slim_spec.json of a measured-AP chain "
                         "(default: dense model)")
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("-b", "--batch", type=int, default=128)
    ap.add_argument("--quant", default="w8a8", choices=["w8a8", "bf16"])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--nms", type=float, default=0.55)
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cocodet_tpu.compress import load_slim_spec
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    slim = load_slim_spec(args.spec) if args.spec else None
    cpu = jax.devices("cpu")[0]
    print(f"# building model (slim={'yes' if slim else 'no'}, "
          f"{args.quant}) on host CPU", flush=True)
    with jax.default_device(cpu):
        model = build_model("yolox-p6", depth=args.depth, width=args.width,
                            fused=True, slim=slim, dtype=jnp.bfloat16)
        variables = dict(model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)))
        if args.quant == "w8a8":
            from cocodet_tpu.compress import quantize_model

            calib_model = build_model("yolox-p6", depth=args.depth,
                                      width=args.width, fused=True,
                                      slim=slim, dtype=jnp.bfloat16,
                                      quant="calib")
            calib = jnp.asarray(
                np.random.RandomState(1).rand(2, 256, 256, 3) * 255,
                jnp.float32)
            variables = quantize_model(calib_model, variables, [calib],
                                       per_channel_act=True)
            model = build_model("yolox-p6", depth=args.depth,
                                width=args.width, fused=True, slim=slim,
                                dtype=jnp.bfloat16, quant="w8a8")
            print("# quantized (w8a8, per-channel act scales)", flush=True)

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    imgs = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(
            args.batch, args.size, args.size, 3) * 255, jnp.float32), device)

    cfg = PostprocessConfig(conf_threshold=args.conf,
                            nms_threshold=args.nms,
                            pre_nms_topk=args.topk, max_det=300,
                            use_pallas=False)
    strides = (8, 16, 32, 64)

    @jax.jit
    def fwd(images):
        return postprocess(model.apply(variables, images), strides, cfg)

    print("# compiling + timing (the one TPU program)", flush=True)
    out = fwd(imgs)
    jax.block_until_ready(out)

    # throughput: chained iterations, one barrier at the end
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(imgs)
    jax.block_until_ready(out)
    img_s = args.batch * args.iters / (time.perf_counter() - t0)

    # latency: block every iteration -> true per-batch latency distribution
    lats = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(imgs))
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.asarray(lats)

    print(json.dumps({
        "spec": args.spec and os.path.relpath(args.spec),
        "depth": args.depth, "width": args.width,
        "size": args.size, "batch": args.batch, "quant": args.quant,
        "img_s": round(float(img_s), 2),
        "ms_batch_p50": round(float(np.percentile(lats, 50)), 3),
        "p50_ms_img": round(float(np.percentile(lats, 50)) / args.batch, 4),
        "p99_ms_img": round(float(np.percentile(lats, 99)) / args.batch, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
