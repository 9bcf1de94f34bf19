#!/usr/bin/env python3
"""Export the detector as a serialized StableHLO artifact (+ AOT compile).

This is the TPU-native replacement for the reference's deployment export
family (ref tools/export_onnx.py, export_torchscript.py, trt.py): one
compiler-native artifact serves the roles of ONNX (interchange),
TorchScript (freezing), and the TRT engine (ahead-of-time compilation).

Produces:
  <out>.stablehlo  — portable serialized jax.export artifact (decode
                     in-graph or raw outputs, like the reference's
                     decode_in_inference switch, ref yolo_head.py:29)
  optionally runs an AOT compile check for the current backend.

Load and run anywhere with:
  from jax import export as jexport
  fn = jexport.deserialize(open(path, 'rb').read()).call
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("export_stablehlo")
    ap.add_argument("-n", "--name", default="yolox-m-p6")
    ap.add_argument("-f", "--exp_file", default=None)
    ap.add_argument("-c", "--ckpt", default=None)
    ap.add_argument("-o", "--output", default="yolox_m_p6.stablehlo")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--tsize", type=int, default=640)
    ap.add_argument("--decode", action="store_true",
                    help="include decode+NMS in the exported graph")
    ap.add_argument("--slim-spec", default=None,
                    help="channel-slim spec json: export the slimmed "
                         "deployment model (pipeline stage-5 artifact)")
    ap.add_argument("--stem6", action="store_true",
                    help="export with the Focus stem rewritten as the "
                         "equivalent 6x6 s2 conv (ops/fuse.py "
                         "fold_focus_stem)")
    ap.add_argument("--quant", default=None, choices=[None, "w8a8"],
                    help="export the int8-PTQ model (ckpt must carry the "
                         "'quant' collection from tools/quantize_model.py)")
    ap.add_argument("--split-cat", action="store_true",
                    help="export the split-concat FPN deployment graph "
                         "(models/pafpn.py split_cat; exact in int8)")
    ap.add_argument("--depth", type=float, default=None,
                    help="model depth for --slim-spec/--quant builds "
                         "(default: from the exp)")
    ap.add_argument("--width", type=float, default=None)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--nms", type=float, default=0.55)
    ap.add_argument("--aot-check", action="store_true",
                    help="AOT-compile the artifact for the local backend")
    ap.add_argument("--cpu", action="store_true",
                    help="trace/lower on the CPU backend (artifact platform "
                         "'cpu'; use on a busy/absent accelerator)")
    ap.add_argument("--mlir", action="store_true",
                    help="also emit <out>.mlir + <out>.compile_options.pb "
                         "for the native PJRT runner (serving/pjrt_runner)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import export as jexport

    from cocodet_tpu.exp import get_exp
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    exp = get_exp(args.exp_file, args.name)

    x_spec = jax.ShapeDtypeStruct(
        (args.batch_size, args.tsize, args.tsize, 3), jnp.float32)

    if args.slim_spec or args.quant or args.stem6 or args.split_cat:
        # deployment artifacts (slim / int8) load through the SAME builder
        # the submission harness uses, so the exported graph is exactly the
        # served program
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "harness"))
        import importlib

        hmain = importlib.import_module("main")
        model, variables = hmain.build_model_and_vars({
            "model": {"type": args.name,
                      "depth": (args.depth if args.depth is not None
                                else exp.depth),
                      "width": (args.width if args.width is not None
                                else exp.width)},
            "ckpt": args.ckpt, "slim_spec": args.slim_spec,
            "quant": args.quant, "stem6": args.stem6,
            "split_cat": args.split_cat, "half": True,
        })
    else:
        model = exp.get_model(fused=True)
        if args.ckpt:
            from cocodet_tpu.utils.checkpoint import load_checkpoint

            variables = load_checkpoint(args.ckpt).get("model")
        else:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros(x_spec.shape, x_spec.dtype))
            print("WARNING: exporting random weights")

    cfg = PostprocessConfig(conf_threshold=args.conf,
                            nms_threshold=args.nms)
    if args.decode:
        # the decoded graph returns an NMSResult namedtuple; register it so
        # jax.export can serialize the output pytree
        from cocodet_tpu.ops.nms import register_export_serialization

        register_export_serialization()

    def forward(images):
        outputs = model.apply(variables, images)
        if args.decode:
            return postprocess(outputs, exp.strides, cfg)
        # raw per-level maps (decode_in_inference=False analogue)
        return [tuple(o[k] for k in ("reg", "obj", "cls")) for o in outputs]

    exported = jexport.export(jax.jit(forward))(x_spec)
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {args.output} ({len(blob) / 1e6:.1f} MB), "
          f"input {x_spec.shape}, platforms {exported.platforms}")

    if args.mlir:
        # plain StableHLO module + serialized CompileOptions for the C++
        # PJRT runner (weights are baked into the module as constants)
        lowered = jax.jit(forward).lower(x_spec)
        mlir_path = os.path.splitext(args.output)[0] + ".mlir"
        with open(mlir_path, "w") as f:
            f.write(lowered.compiler_ir(dialect="stablehlo").operation.get_asm(
                large_elements_limit=None))
        from jaxlib.xla_client import CompileOptions

        opts_path = os.path.splitext(args.output)[0] + ".compile_options.pb"
        with open(opts_path, "wb") as f:
            f.write(CompileOptions().SerializeAsString())
        print(f"wrote {mlir_path} + {opts_path} "
              f"(run: serving/pjrt_runner <plugin.so> {mlir_path} {opts_path})")

    if args.aot_check:
        lowered = jax.jit(forward).lower(x_spec)
        compiled = lowered.compile()
        print("AOT compile ok:",
              compiled.cost_analysis() and "cost analysis available")


if __name__ == "__main__":
    main()
