#!/usr/bin/env python3
"""TPU A/B: bf16 vs int8 (w8a8) inference on the pruned+slimmed
YOLOX-M-P6 at 640/b128/K=1024 — the bench.py operating point.

Construction (prune -> merge -> slim -> calibrate -> quantize) happens on
the host CPU backend; the TPU sees one compiled program per measured
variant (use --only to keep it to exactly one per process — the tunnel's
remote compiles are 3-6 min each and occasionally wedge).

Calibration uses random uniform [0,255) images: for *throughput* A/B the
scales only need to be realistic magnitudes, not accuracy-bearing (the
accuracy story is tools/quantize_model.py + eval_harness_ckpt.py on the
synthetic chain: int8 AP50 0.8241 vs bf16 0.8217 — neutral).
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

BATCH, SIZE = 128, 640
STRIDES = (8, 16, 32, 64)


def main():
    ap = argparse.ArgumentParser("bench_int8")
    ap.add_argument("--only", choices=["bf16", "w8a8"], default=None,
                    help="measure just one variant (one TPU program)")
    ap.add_argument("-b", "--batch", type=int, default=BATCH)
    ap.add_argument("--size", type=int, default=SIZE)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--act-scales", choices=["tensor", "channel"],
                    default="tensor",
                    help="w8a8 activation-scale granularity "
                         "(compress/quantize.py per_channel_act)")
    ap.add_argument("--split-cat", action="store_true",
                    help="split-concat FPN deployment graph (exact in int8; "
                         "models/pafpn.py split_cat)")
    ap.add_argument("--stem6", action="store_true",
                    help="serve the Focus stem as its exact 6x6 s2 conv "
                         "(ops/fuse.py fold_focus_stem; quantization runs "
                         "first, then params+quant trees are folded — the "
                         "tests/test_stem6.py int8-exact order)")
    args = ap.parse_args()
    batch, size = args.batch, args.size

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=1024, max_det=300,
                            use_pallas=False)

    print("# building slim model on host CPU", flush=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        slim_model, slim_vars = bench._build_slim()
        slim_vars = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), dict(slim_vars))
        if args.split_cat:
            from cocodet_tpu.models import build_model

            slim_model = build_model(
                "yolox-p6", depth=0.67, width=0.75, fused=True,
                slim=slim_model.slim, dtype=jnp.bfloat16, split_cat=True)
        if args.only != "bf16":
            print("# calibrating + quantizing on host CPU", flush=True)
            # the exact headline recipe — shared with bench.py main()
            q_model, qvars = bench._quantize_slim(
                slim_model, slim_vars,
                per_channel_act=args.act_scales == "channel",
                split_cat=args.split_cat)
        if args.stem6:
            from cocodet_tpu.models import build_model
            from cocodet_tpu.ops.fuse import fold_focus_quant, fold_focus_stem

            slim_vars = dict(slim_vars)
            slim_vars["params"] = fold_focus_stem(
                slim_vars["params"], order="pixel_unshuffle")
            slim_model = build_model(
                "yolox-p6", depth=0.67, width=0.75, fused=True,
                slim=slim_model.slim, dtype=jnp.bfloat16,
                stem6=True, split_cat=args.split_cat)
            if args.only != "bf16":
                qvars = dict(qvars)
                qvars["params"] = fold_focus_stem(
                    qvars["params"], order="pixel_unshuffle")
                qvars["quant"] = fold_focus_quant(qvars["quant"])
                q_model = build_model(
                    "yolox-p6", depth=0.67, width=0.75, fused=True,
                    slim=slim_model.slim, dtype=jnp.bfloat16, quant="w8a8",
                    stem6=True, split_cat=args.split_cat)

    device = jax.devices()[0]
    imgs = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 3) * 255,
                    jnp.float32), device)

    def measure(tag, model, variables):
        variables = jax.device_put(variables, device)

        @jax.jit
        def fwd(images):
            return postprocess(model.apply(variables, images), STRIDES, cfg)

        print(f"# compiling + timing {tag}", flush=True)
        t = bench._timeit(fwd, imgs)
        print(f"{tag} b{batch}: {1e3 * t:.2f} ms ({batch / t:.1f} img/s)",
              flush=True)

    if args.only in (None, "bf16"):
        measure("bf16 ", slim_model, slim_vars)
    if args.only in (None, "w8a8"):
        tag = "w8a8" + (" perchan" if args.act_scales == "channel" else "")
        measure(tag + " ", q_model, qvars)


if __name__ == "__main__":
    main()
