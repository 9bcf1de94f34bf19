#!/usr/bin/env python3
"""Speed-of-light (roofline) analysis of the deployment inference program.

Answers "how close is the measured throughput to what the hardware can
possibly do for THIS program?" — the question behind every further
inference-optimization decision (it is why split_cat was worth trying and
why its measured loss closed the question; see ROADMAP.md round-4).

Method: compile the exact bench.py program (model forward + decode + NMS
postprocess) on the HOST CPU backend — never touching the TPU tunnel —
and read XLA's own cost analysis of the optimized HLO (flops + bytes
accessed, the same numbers `jax.jit(...).lower().compile()
.cost_analysis()` reports; utils/model_utils.py uses the same source for
the ref-format get_model_info string).  Then:

    sol_compute_ms = flops / peak_flops        (MXU-bound floor)
    sol_memory_ms  = bytes / hbm_bandwidth     (HBM-bound floor)
    speed_of_light = max(compute, memory)      (roofline)

and, when a measured time is supplied (or known from the recorded v5e
runs), the achieved fraction of that floor.

Caveats, stated so the numbers stay honest:
- Flops from the CPU-compiled HLO are exact for the arithmetic (convs/
  dots counted analytically from shapes).  Bytes are NOT: the CPU
  lowering fuses far less than the TPU one, so its "bytes accessed" is a
  NO-FUSION UPPER BOUND on HBM traffic (measured 2.5-3x above what the
  v5e timing implies).  The tool therefore brackets memory with two
  bounds — upper = CPU-HLO bytes, lower = params + input + output
  (perfect fusion) — and takes the roofline floor from the lower bound.
  The true program sits between; only a real on-chip profile pins it.
- int8 (w8a8) convs execute on the MXU at 2x the bf16 rate; the tool
  reports both the bf16-peak and int8-peak floors for quant runs.

Reference parity: the reference reports per-module latency + params/
GFLOPs (speed_evaluation_p6.py, yolox/utils/model_utils.py:21-29) but
has no utilization analysis; this is the TPU-native extension of that
surface.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

# One v5e chip (public TPU v5e specs).
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
HBM_GB_S = 819.0

# Recorded v5e measurements at 640/b128/K=1024 (ROADMAP.md round-3/4
# tables; tools/bench_int8.py / bench_breakdown.py, readback-validated).
MEASURED_MS = {
    ("slim", "w8a8"): 49.46,    # per-channel act scales, r4b queue
    ("slim", "bf16"): 52.67,    # r3 pallas A/B baseline
    ("dense", "bf16"): 91.04,   # 1406 img/s, r2 table
}


def main():
    ap = argparse.ArgumentParser("roofline")
    ap.add_argument("-b", "--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--mode", choices=["slim", "dense"], default="slim")
    ap.add_argument("--quant", choices=["bf16", "w8a8"], default="w8a8")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured ms/batch on the v5e (defaults to the "
                         "recorded number for known configs)")
    ap.add_argument("--model-only", action="store_true",
                    help="analyze the bare forward without postprocess")
    ap.add_argument("-o", "--json-out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # cost analysis only
    import jax.numpy as jnp

    import bench
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    print(f"# building {args.mode} model ({args.quant})", flush=True)
    if args.mode == "slim":
        model, variables = bench._build_slim()
        if args.quant == "w8a8":
            model, variables = bench._quantize_slim(
                model, variables, per_channel_act=True)
    else:
        from cocodet_tpu.models import build_model

        model = build_model("yolox-p6", depth=0.67, width=0.75,
                            dtype=jnp.bfloat16, fused=True)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32))
        if args.quant == "w8a8":
            model, variables = bench._quantize_slim(
                model, variables, per_channel_act=True)

    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=args.topk, max_det=300,
                            use_pallas=False)
    strides = (8, 16, 32, 64)

    def fwd(v, images):
        out = model.apply(v, images)
        if args.model_only:
            return out
        return postprocess(out, strides, cfg)

    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    print(f"# compiling {args.batch}x{args.size} for cost analysis "
          "(CPU backend, may take a few minutes)", flush=True)
    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    # jaxlib returns either a dict or a 1-element list of dicts
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byte_keys = [k for k in cost if k.startswith("bytes accessed")]
    bytes_upper = max((float(cost[k]) for k in byte_keys), default=0.0)

    # Perfect-fusion lower bound on HBM traffic: every parameter read
    # once, the input read once, the output written once.  Real fused
    # programs also spill inter-stage feature maps, so this is a floor.
    from cocodet_tpu.utils.model_utils import count_params

    def _tree_bytes(tree):
        import jax

        return sum(int(np.prod(np.shape(p))) * np.dtype(p.dtype).itemsize
                   for p in jax.tree_util.tree_leaves(tree))

    out_shape = jax.eval_shape(fwd, variables, x)
    bytes_lower = (_tree_bytes(variables) + x.size * x.dtype.itemsize
                   + _tree_bytes(out_shape))

    per_img_gflop = flops / args.batch / 1e9
    intensity = flops / bytes_upper if bytes_upper else float("inf")

    sol_bf16_ms = flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3
    sol_int8_ms = flops / (PEAK_INT8_TOPS * 1e12) * 1e3
    sol_mem_lower_ms = bytes_lower / (HBM_GB_S * 1e9) * 1e3
    sol_mem_upper_ms = bytes_upper / (HBM_GB_S * 1e9) * 1e3
    compute_ms = sol_int8_ms if args.quant == "w8a8" else sol_bf16_ms
    peak_ms = max(compute_ms, sol_mem_lower_ms)
    bound = "compute" if peak_ms == compute_ms else "memory"

    measured = args.measured_ms
    if measured is None and args.batch == 128 and args.size == 640 \
            and not args.model_only:
        measured = MEASURED_MS.get((args.mode, args.quant))

    report = {
        "config": {"mode": args.mode, "quant": args.quant,
                   "batch": args.batch, "size": args.size,
                   "topk": args.topk, "model_only": args.model_only},
        "flops_per_batch": flops,
        "gflops_per_img": round(per_img_gflop, 2),
        "bytes_hbm_upper_no_fusion": bytes_upper,
        "bytes_hbm_lower_perfect_fusion": bytes_lower,
        "arithmetic_intensity_vs_upper": round(intensity, 1),
        "sol_ms": {"compute_bf16": round(sol_bf16_ms, 2),
                   "compute_int8": round(sol_int8_ms, 2),
                   "hbm_lower": round(sol_mem_lower_ms, 2),
                   "hbm_upper": round(sol_mem_upper_ms, 2),
                   "roofline_floor": round(peak_ms, 2)},
        "roofline_bound": bound,
    }
    if measured:
        mxu_rate = flops / (measured * 1e-3) / 1e12
        report["measured_ms"] = measured
        report["achieved_tflops"] = round(mxu_rate, 1)
        report["pct_of_bf16_peak"] = round(100 * mxu_rate / PEAK_BF16_TFLOPS,
                                           1)
        if args.quant == "w8a8":
            report["pct_of_int8_peak"] = round(
                100 * mxu_rate / PEAK_INT8_TOPS, 1)
        report["pct_of_sol"] = round(100 * peak_ms / measured, 1)
        # Where the measured time sits between the two memory bounds:
        # >100% of hbm_lower is expected (real programs spill), >100% of
        # hbm_upper would mean the cost model itself is off.
        report["implied_hbm_gb_s_if_memory_bound"] = round(
            bytes_upper / (measured * 1e-3) / 1e9, 1)

    print(json.dumps(report, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
