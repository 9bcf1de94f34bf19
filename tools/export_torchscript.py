#!/usr/bin/env python3
"""Export a cocodet_tpu checkpoint to a TorchScript artifact.

Parity target: ref tools/export_torchscript.py:55-75 — jit.trace of the
eval-mode model with in-graph decode off (raw (B, A, 5+nc) with sigmoid
obj/cls), saved as a self-contained .torchscript.pt that any libtorch
runtime loads without python model code.

Same bridge as tools/export_onnx.py: msgpack ckpt -> reference-layout
torch model (bit-exact weight mapping, utils/torch_import.py) ->
torch.jit.trace.  The traced module is round-trip verified (torch.jit.load
forward vs eager forward) before the tool reports success.

Usage:
  python tools/export_torchscript.py -c outputs/exp/best_ckpt.msgpack \\
      -o weights/model.torchscript.pt [--size 640] [--batch 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def export_torchscript(variables, out_path: str, depth: float, width: float,
                       size: int = 640, batch: int = 1,
                       num_classes: int = 80,
                       ref_path: str = "/root/reference") -> float:
    """variables: flax tree {params, batch_stats} -> traced module on disk.
    Returns the max |traced - eager| forward difference (round-trip check).
    """
    import torch

    from export_onnx import build_ref_torch_model
    from cocodet_tpu.utils.torch_import import export_state_dict

    model = build_ref_torch_model(ref_path, depth, width, num_classes)
    sd = export_state_dict(variables, variant="p6", num_levels=4)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not real_missing and not unexpected, (real_missing, unexpected)

    dummy = torch.zeros(batch, 3, size, size)
    with torch.no_grad():
        traced = torch.jit.trace(model, dummy)
    traced.save(out_path)

    # round-trip: the saved artifact must reproduce the eager forward
    loaded = torch.jit.load(out_path)
    probe = torch.rand(batch, 3, size, size) * 255.0
    with torch.no_grad():
        want = model(probe)
        got = loaded(probe)
    return float((got - want).abs().max())


def main():
    ap = argparse.ArgumentParser("export_torchscript")
    ap.add_argument("-c", "--ckpt", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--num-classes", type=int, default=80)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ref-path", default="/root/reference")
    ap.add_argument("--raw", action="store_true",
                    help="export the raw (non-EMA) weights")
    args = ap.parse_args()

    from cocodet_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    variables = ckpt.get("raw_model" if args.raw else "model", ckpt)
    if "params" not in variables:
        variables = {"params": variables}

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    diff = export_torchscript(variables, args.out, args.depth, args.width,
                              size=args.size, batch=args.batch,
                              num_classes=args.num_classes,
                              ref_path=args.ref_path)
    assert diff < 1e-5, f"round-trip mismatch: {diff}"
    print(f"exported {os.path.getsize(args.out)} bytes -> {args.out} "
          f"(round-trip max |diff| {diff:.2e})")


if __name__ == "__main__":
    main()
