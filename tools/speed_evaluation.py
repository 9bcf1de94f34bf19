#!/usr/bin/env python3
"""Per-module latency micro-benchmark.

Parity target: ref speed_evaluation.py:33-44 + speed_evaluation_p6.py:8-191
(run_module: 50 warmup + 250 timed iters with device sync; walks
stem/dark2..6/FPN/head printing per-block latency + param counts).

TPU re-design: instead of calling torch submodules one by one, each stage
boundary becomes a jitted program whose outputs stop at that stage — XLA
dead-code-eliminates everything after it, so (t_k - t_{k-1}) isolates stage
k's cost including realistic fusion across the boundary. Per-stage param
counts come from the param tree scopes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_fn(fn, x, warmup=20, iters=100):
    import jax

    jax.block_until_ready(fn(x))
    for _ in range(warmup - 1):
        fn(x)
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser("speed_evaluation")
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--variant", default="yolox-p6")
    ap.add_argument("--tsize", type=int, default=768)
    ap.add_argument("-b", "--batch-size", type=int, default=1)
    ap.add_argument("--fp32", action="store_true",
                    help="default is bf16 (the fp16-at-768 analogue, "
                         "ref speed_evaluation_p6.py default half)")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cocodet_tpu.models import build_model
    from cocodet_tpu.models.darknet import BACKBONE_STAGES
    from cocodet_tpu.models.yolox import MODEL_SPECS

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = build_model(args.variant, depth=args.depth, width=args.width,
                        dtype=dtype)
    spec = MODEL_SPECS[args.variant]
    x = jnp.asarray(
        np.random.rand(args.batch_size, args.tsize, args.tsize, 3) * 255,
        jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def params_in(scope_prefix):
        import numpy as np
        from flax.traverse_util import flatten_dict

        flat = flatten_dict(variables["params"])
        return sum(int(np.prod(v.shape)) for k, v in flat.items()
                   if "/".join(k).startswith(scope_prefix))

    # stage boundaries via DCE: a jitted fn returning only up to stage k
    from cocodet_tpu.models.darknet import CSPBackbone
    from cocodet_tpu.models.pafpn import PAFPN_VARIANTS

    stages = [s.name for s in BACKBONE_STAGES[
        PAFPN_VARIANTS[spec.variant]["backbone"]]]

    timings = []
    prev = 0.0
    for k, stage in enumerate(stages):
        bb = CSPBackbone(
            variant=PAFPN_VARIANTS[spec.variant]["backbone"],
            depth=args.depth, width=args.width, act=spec.act,
            out_features=(stage,), dtype=dtype)
        bvars = {"params": variables["params"]["backbone"]["backbone"],
                 "batch_stats": variables["batch_stats"]["backbone"]["backbone"]}
        fn = jax.jit(lambda xx, _bb=bb, _v=bvars: _bb.apply(_v, xx))
        t = run_fn(fn, x, iters=args.iters)
        scope = (f"backbone/backbone/{stage}_down", )
        timings.append((stage, t - prev,
                        params_in(f"backbone/backbone/{stage}")))
        prev = t

    # full backbone+fpn
    from cocodet_tpu.models.pafpn import YOLOPAFPN

    fpn = YOLOPAFPN(variant=spec.variant, depth=args.depth,
                    width=args.width, act=spec.act, dtype=dtype)
    fvars = {"params": variables["params"]["backbone"],
             "batch_stats": variables["batch_stats"]["backbone"]}
    t_fpn = run_fn(jax.jit(lambda xx: fpn.apply(fvars, xx)), x,
                   iters=args.iters)
    timings.append(("pafpn(neck only)", t_fpn - prev,
                    params_in("backbone") - params_in("backbone/backbone")))

    t_full = run_fn(jax.jit(lambda xx: model.apply(variables, xx)), x,
                    iters=args.iters)
    timings.append(("head", t_full - t_fpn, params_in("head")))

    total_params = params_in("")
    print(f"\n{args.variant} d={args.depth} w={args.width} "
          f"@{args.tsize} b{args.batch_size} "
          f"{'fp32' if args.fp32 else 'bf16'}")
    print(f"{'stage':20s} {'us/img':>10s} {'params':>12s}")
    for name, dt, n in timings:
        print(f"{name:20s} {1e6 * dt / args.batch_size:10.1f} {n:12,d}")
    print(f"{'TOTAL':20s} {1e6 * t_full / args.batch_size:10.1f} "
          f"{total_params:12,d}")
    print(f"throughput: {args.batch_size / t_full:.1f} img/s")


if __name__ == "__main__":
    main()
