#!/usr/bin/env python3
"""Throughput breakdown: model-only vs +decode vs +NMS, batch sweep.

Drives the same fused YOLOX-M-P6 as bench.py and isolates the postprocess
cost, sweeping batch size and pre-NMS K. Run on the real TPU.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def timeit(fn, arg, iters=20):
    import jax

    jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batches", type=int, nargs="+", default=[8])
    ap.add_argument("--topk", type=int, nargs="+", default=[2048])
    ap.add_argument("--mode", choices=["model", "decode", "full", "all"],
                    default="all")
    ap.add_argument("--slim", action="store_true",
                    help="use the 49%%-pruned channel-slimmed model "
                         "(bench.py's random tied pattern)")
    ap.add_argument("--pallas", action="store_true",
                    help="use the pallas overlap-matrix NMS kernel")
    ap.add_argument("--stem6", action="store_true",
                    help="serve the Focus stem as the equivalent 6x6 s2 "
                         "conv (ops/fuse.py fold_focus_stem) — A/B the "
                         "space-to-depth HBM re-gather against one conv")
    ap.add_argument("--split-cat", action="store_true",
                    help="split-concat FPN deployment graph (pafpn.py "
                         "split_cat): no concat materializations, top-down "
                         "1x1s at quarter resolution; same checkpoint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.decode import attach_strides, concat_levels, decode_corner_scores
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    if args.slim:
        import bench as _bench

        model, slim_vars = _bench._build_slim()
        slim_vars = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32), slim_vars)
    else:
        model = build_model("yolox-p6", depth=0.67, width=0.75,
                            dtype=jnp.bfloat16, fused=True)
    rng = jax.random.PRNGKey(0)
    strides = (8, 16, 32, 64)

    variables = (slim_vars if args.slim
                 else jax.jit(model.init)(
                     rng, jnp.zeros((1, args.size, args.size, 3),
                                    jnp.float32)))
    if args.stem6:
        from cocodet_tpu.ops.fuse import fold_focus_stem

        variables = dict(variables)
        variables["params"] = fold_focus_stem(
            variables["params"], order="pixel_unshuffle")
    if args.stem6 or args.split_cat:
        model = build_model("yolox-p6", depth=0.67, width=0.75,
                            dtype=jnp.bfloat16, fused=True,
                            slim=getattr(model, "slim", None),
                            stem6=args.stem6, split_cat=args.split_cat)

    for b in args.batches:
        x = jnp.asarray(np.random.rand(b, args.size, args.size, 3) * 255,
                        jnp.float32)

        fwd = jax.jit(lambda im: model.apply(variables, im))

        def fwd_decode(im):
            outs = model.apply(variables, im)
            preds, grids, sv = concat_levels(attach_strides(outs, strides))
            return decode_corner_scores(preds, grids, sv)

        row = [f"b{b}:"]
        if args.mode in ("model", "all"):
            t_fwd = timeit(fwd, x)
            row.append(f"model {1e3 * t_fwd:7.2f} ms ({b / t_fwd:7.1f} img/s)")
        if args.mode in ("decode", "all"):
            t_dec = timeit(jax.jit(fwd_decode), x)
            row.append(f"+decode {1e3 * t_dec:7.2f} ms")
        for k in (args.topk if args.mode in ("full", "all") else []):
            cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                                    pre_nms_topk=k, max_det=300,
                                    use_pallas=args.pallas)

            def full(im, _cfg=cfg):
                return postprocess(model.apply(variables, im), strides, _cfg)

            t_full = timeit(jax.jit(full), x)
            row.append(f"+nms(k={k}) {1e3 * t_full:7.2f} ms "
                       f"({b / t_full:7.1f} img/s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
