#!/usr/bin/env python3
"""Export a cocodet_tpu checkpoint to a portable ONNX artifact.

Parity target: ref tools/export_onnx.py:56-113 — load ckpt, set
``head.decode_in_inference = False`` (raw (B, A, 5+nc) with sigmoid
obj/cls), export with named input "images" / output "output".

Pipeline: msgpack ckpt -> reference-layout torch model (the bit-exact
bridge from utils/torch_import.py, verified by tests/test_torch_parity.py)
-> torch's C++ ONNX serializer -> compiled-in proto checker.  This
environment has no python ``onnx`` package; the only step of the
TorchScript exporter that needs it (custom onnxscript-function insertion)
is a no-op for standard ops and is bypassed.  The artifact can be executed
and verified WITHOUT onnxruntime via cocodet_tpu.utils.onnx_io (numpy
evaluator — the in-repo analogue of demo/ONNXRuntime/onnx_inference.py).

Requires the reference torch model classes on --ref-path (default
/root/reference) purely as the torch-module layout for the exporter; the
weights come from our checkpoint.

Usage:
  python tools/export_onnx.py -c outputs/exp/best_ckpt.msgpack \\
      -o weights/model.onnx [--size 640] [--batch 1] [--selfcheck]
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _install_stubs():
    """Stub the reference's unavailable deps (loguru/torchvision/thop) —
    same shim the torch-parity tests use."""
    if "loguru" not in sys.modules:
        m = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        m.logger = _L()
        sys.modules["loguru"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = lambda *a, **k: None
        ops.batched_nms = lambda *a, **k: None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if "thop" not in sys.modules:
        th = types.ModuleType("thop")
        th.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = th


def build_ref_torch_model(ref_path: str, depth: float, width: float,
                          num_classes: int = 80, act: str = "hard_swish"):
    """Instantiate the reference's torch YOLOX-P6 (the ONNX graph donor)."""
    _install_stubs()
    sys.path.insert(0, ref_path)
    try:
        from yolox.models.yolo_head_custom import YOLOXHeadCustom
        from yolox.models.yolo_pafpn_p6 import YOLOPAFPNCustomP6
        from yolox.models.yolox_p6 import YOLOXCustomP6
    finally:
        sys.path.remove(ref_path)
    in_channels = [256, 512, 768, 1024]
    backbone = YOLOPAFPNCustomP6(depth, width, act=act,
                                 in_channels=in_channels)
    head = YOLOXHeadCustom(num_classes, width, act=act,
                           strides=(8, 16, 32, 64), in_channels=in_channels)
    model = YOLOXCustomP6(backbone, head)
    model.eval()
    model.head.decode_in_inference = False
    return model


def export_onnx(variables, out_path: str, depth: float, width: float,
                size: int = 640, batch: int = 1, opset: int = 13,
                num_classes: int = 80, ref_path: str = "/root/reference"):
    """variables: flax tree {params, batch_stats} -> .onnx on disk.
    Returns the serialized byte length."""
    import torch
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    from cocodet_tpu.utils.torch_import import export_state_dict

    model = build_ref_torch_model(ref_path, depth, width, num_classes)
    sd = export_state_dict(variables, variant="p6", num_levels=4)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # num_batches_tracked buffers have no flax counterpart; anything else
    # missing means a real layout mismatch
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not real_missing and not unexpected, (real_missing, unexpected)

    # the one python-onnx-dependent step (custom onnxscript-function
    # insertion) is a no-op for standard ops — bypass it
    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda b, c: b
    try:
        dummy = torch.zeros(batch, 3, size, size)
        torch.onnx.export(model, (dummy,), out_path, dynamo=False,
                          opset_version=opset, input_names=["images"],
                          output_names=["output"])
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig

    with open(out_path, "rb") as fh:
        data = fh.read()
    torch._C._check_onnx_proto(data)  # compiled-in conformance checker
    return len(data)


def main():
    ap = argparse.ArgumentParser("export_onnx")
    ap.add_argument("-c", "--ckpt", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--opset", type=int, default=13)
    ap.add_argument("--ref-path", default="/root/reference")
    ap.add_argument("--raw", action="store_true",
                    help="export the raw (non-EMA) weights")
    ap.add_argument("--selfcheck", action="store_true",
                    help="run the artifact with the numpy evaluator and "
                         "compare against the jax forward")
    args = ap.parse_args()

    from cocodet_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    variables = ckpt.get("raw_model" if args.raw else "model", ckpt)
    if "params" not in variables:
        variables = {"params": variables}

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    nbytes = export_onnx(variables, args.out, args.depth, args.width,
                         size=args.size, batch=args.batch, opset=args.opset,
                         num_classes=args.num_classes,
                         ref_path=args.ref_path)
    print(f"exported {nbytes} bytes -> {args.out} (opset {args.opset}, "
          f"checker OK)")

    if args.selfcheck:
        import numpy as np

        import jax.numpy as jnp

        from cocodet_tpu.models import build_model
        from cocodet_tpu.ops.decode import attach_strides, concat_levels
        from cocodet_tpu.utils.onnx_io import load_onnx, run_onnx

        x = (np.random.RandomState(0)
             .rand(args.batch, 3, args.size, args.size)
             .astype(np.float32) * 255.0)
        m = load_onnx(args.out)
        (onnx_out,) = run_onnx(m, {"images": x})

        model = build_model("yolox-p6", depth=args.depth, width=args.width,
                            num_classes=args.num_classes)
        outputs = model.apply(dict(variables),
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
        preds, _, _ = concat_levels(attach_strides(outputs, (8, 16, 32, 64)))
        preds = np.asarray(preds)
        jax_out = np.concatenate(
            [preds[..., :4], 1.0 / (1.0 + np.exp(-preds[..., 4:]))], -1)
        diff = np.abs(onnx_out - jax_out).max()
        print(f"selfcheck: onnx-vs-jax max |diff| = {diff:.2e}")
        assert diff < 2e-3, diff


if __name__ == "__main__":
    main()
