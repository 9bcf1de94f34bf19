#!/usr/bin/env python3
"""Edge/mobile deployment export: ONNX straight from the jax graph.

Role parity: the reference's mobile path is ONNX -> ncnn param/bin -> the
Android app (ref demo/ncnn/android/app/src/main/jni/yoloXncnn_jni.cpp:278,
demo/ncnn/cpp/yolox.cpp:282-290) and ONNX -> OpenVINO at 416px
(ref demo/OpenVINO).  The torch-donor exporter (tools/export_onnx.py)
cannot express channel-slimmed widths or the w8a8 graph; this tool traces
OUR fused model's jaxpr (utils/onnx_export.py) so the actual competition
artifact class — pruned + slim (+ int8) — exports directly.

Output convention matches the reference ONNX demos: one "output" tensor
(B, A, 5+nc) raw grid predictions with sigmoid obj/cls
(decode_in_inference=False; ncnn's generate_yolox_proposals and our
utils/onnx_io evaluator both consume this).  The artifact is
self-checked against the jax forward through the in-repo numpy evaluator
before the tool reports success.

With --quant w8a8 the int8 deployment graph is exported in float-QDQ
form: x/s -> Round -> Clip -> conv -> rescale as float ops — value-
faithful to the s8xs8->s32 device program (values sit on the integer
grid), and the form mobile toolchains fuse back to int8 kernels.

--calib-json additionally dumps the calibrated activation scales +
per-channel weight scales (for runtimes that quantize at conversion
time, e.g. ncnn2table-style flows).  See serving/EDGE.md for the
conversion recipe.

Usage:
  python tools/export_edge.py -c outputs/chain/pipe_slim_ckpt.msgpack \\
      --slim-spec outputs/chain/pipe_slim_spec.json \\
      --depth 0.33 --width 0.25 --size 416 [--quant w8a8] \\
      -o edge/yolox_slim_416.onnx [--cpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("export_edge")
    ap.add_argument("-c", "--ckpt", required=True,
                    help="fused deployment .msgpack (compress output)")
    ap.add_argument("-o", "--out", required=True, help="output .onnx")
    ap.add_argument("-n", "--name", default="yolox-p6")
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--slim-spec", default=None)
    ap.add_argument("--size", type=int, default=416,
                    help="input size (416 = the reference's OpenVINO/ncnn "
                         "operating point)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--quant", choices=["none", "w8a8"], default="none",
                    help="w8a8: export the int8 deployment graph in "
                         "float-QDQ form (ckpt must be a quantized "
                         "artifact carrying the quant collection)")
    ap.add_argument("--calib-json", default=None,
                    help="also dump calibration scales as JSON")
    ap.add_argument("--tol", type=float, default=1e-4,
                    help="selfcheck max |onnx - jax| tolerance")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU tunnel "
                         "alone)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cocodet_tpu.compress import load_slim_spec
    from cocodet_tpu.models import MODEL_SPECS, build_model
    from cocodet_tpu.ops.decode import attach_strides, concat_levels
    from cocodet_tpu.utils.checkpoint import load_checkpoint
    from cocodet_tpu.utils.logger import logger
    from cocodet_tpu.utils.onnx_export import export_fn_to_onnx
    from cocodet_tpu.utils.onnx_io import load_onnx, run_onnx

    spec = load_slim_spec(args.slim_spec) if args.slim_spec else None
    strides = MODEL_SPECS[args.name].strides
    if args.size % max(strides):
        ap.error(f"--size {args.size} not divisible by the {args.name} "
                 f"max stride {max(strides)} (the PAFPN top-down concat "
                 f"needs exact /2 alignment at every level; for P6 use "
                 f"384/448/512, the ref ncnn 416 maps to P5 models)")
    quant = None if args.quant == "none" else args.quant
    # edge runtimes compute f32 (or their own int8): export at f32
    model = build_model(args.name, depth=args.depth, width=args.width,
                        num_classes=args.num_classes, fused=True,
                        slim=spec, dtype=jnp.float32, quant=quant)

    ckpt = load_checkpoint(args.ckpt)
    variables = ckpt.get("model", ckpt)
    if "params" not in variables:
        variables = {"params": variables}
    # int8 kernels stay int8 (the QDQ graph needs them); floats go f32
    variables = jax.tree_util.tree_map(
        lambda x: x if x.dtype == jnp.int8 else jnp.asarray(x, jnp.float32),
        variables)
    if quant and "quant" not in variables:
        raise SystemExit("--quant w8a8 needs a quantized ckpt "
                         "(tools/quantize_model.py output)")

    def fwd(x):
        outs = attach_strides(model.apply(variables, x), strides)
        preds, _, _ = concat_levels(outs)
        return jnp.concatenate(
            [preds[..., :4], jax.nn.sigmoid(preds[..., 4:])], axis=-1)

    x0 = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    nbytes = export_fn_to_onnx(fwd, (x0,), args.out)
    logger.info("wrote %s (%.1f MB)", args.out, nbytes / 2**20)

    # ---- selfcheck through the in-repo numpy evaluator ----
    rs = np.random.RandomState(0)
    probe = (rs.rand(args.batch, args.size, args.size, 3) * 255
             ).astype(np.float32)
    want = np.asarray(fwd(jnp.asarray(probe)), np.float32)
    got = run_onnx(load_onnx(args.out), {"images": probe})[0]
    diff = np.abs(got - want)
    err = float(diff.max())
    logger.info("selfcheck: output %s, max |onnx - jax| = %.3g", got.shape,
                err)
    if quant:
        # real-int8 (int32 accumulation, blocks.py quant='w8a8') vs the
        # QDQ-float emulation an edge runtime executes can flip a handful
        # of activations across requant boundaries; demand the flips stay
        # RARE and BOUNDED rather than bit-exact (float exports keep the
        # strict tol below).
        frac_bad = float((diff > 1e-2).mean())
        logger.info("selfcheck (quant): frac |err|>1e-2 = %.2e, p99.9 = %.3g",
                    frac_bad, float(np.percentile(diff, 99.9)))
        # measured on the chainB_t30 448px export: frac 1.1e-3, p99.9
        # 0.011, max 0.087 (~1 act-quant step on raw head units) — a real
        # export bug (wrong weights/layout) corrupts a large fraction at
        # large magnitude, far outside these bounds
        if err > 0.25 or frac_bad > 5e-3:
            raise SystemExit(
                f"selfcheck FAILED (quant): max {err} > 0.25 or "
                f"frac>{1e-2} = {frac_bad} > 5e-3")
    elif err > args.tol:
        raise SystemExit(f"selfcheck FAILED: {err} > {args.tol}")

    if args.calib_json:
        from flax.traverse_util import flatten_dict

        scales = {}
        for path, v in flatten_dict(variables.get("quant", {})).items():
            # scales only: mixed-precision w4 checkpoints carry int32
            # ``w_bits`` leaves in the quant collection, which are not
            # calibration scales and would pollute the JSON downstream
            # converters consume (ADVICE r4).
            if not path[-1].endswith("_scale"):
                continue
            scales["/".join(path)] = np.asarray(v).tolist()
        with open(args.calib_json, "w") as f:
            json.dump({"img_size": args.size, "act_and_weight_scales":
                       scales}, f)
        logger.info("wrote %s (%d scale entries)", args.calib_json,
                    len(scales))
    print(json.dumps({"onnx": args.out, "bytes": nbytes,
                      "selfcheck_max_err": err, "quant": args.quant,
                      "img_size": args.size}))


if __name__ == "__main__":
    main()
