#!/usr/bin/env python3
"""Offline compression pipeline CLI — the 01 -> 02 -> 03 chain in one tool.

Parity targets:
  - step mask:   ref 01_mask_generator.py (49%% global magnitude mask)
  - step inject: ref 02_direct_pruning.py (mask into checkpoint)
  - step merge:  ref 03_jh_merge.py (BN-fold + mask-multiply) — but emitting
    a dense fused .msgpack (TPU has no use for sparse COO storage) and,
    with --slim, a channel-adapted narrower tree (BASELINE.json requirement)
  - merge_save*.py dense exporters map to `--ratio 0 --step merge`

Usage:
  python tools/compress_pipeline.py -c best_ckpt.msgpack -o weights/ \\
      --ratio 0.49 [--slim]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("compress_pipeline")
    ap.add_argument("-c", "--ckpt", required=True,
                    help="training checkpoint (.msgpack, or .pth reference)")
    ap.add_argument("-o", "--out-dir", default="weights")
    ap.add_argument("--ratio", type=float, default=0.49,
                    help="global magnitude prune ratio (0 disables masking)")
    ap.add_argument("--eps", type=float, default=1e-3, help="BN eps for fold")
    ap.add_argument("--slim", action="store_true",
                    help="physically remove ChannelMask-dead channels")
    ap.add_argument("--variant", default="p6")
    args = ap.parse_args()

    import numpy as np

    from cocodet_tpu.compress import (count_effective_params,
                                      generate_magnitude_masks, inject_masks,
                                      merge_for_deployment, slim_channels)
    from cocodet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from cocodet_tpu.utils.logger import logger

    if args.ckpt.endswith(".pth"):
        from cocodet_tpu.utils.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(args.ckpt, variant=args.variant)
    else:
        ckpt = load_checkpoint(args.ckpt)
        variables = ckpt.get("model", ckpt)

    os.makedirs(args.out_dir, exist_ok=True)

    # step 01: mask generation
    if args.ratio > 0:
        masks = generate_magnitude_masks(variables["params"],
                                         prune_ratio=args.ratio)
        save_checkpoint({"masks": masks}, False, args.out_dir,
                        f"mask_{int(args.ratio * 100)}")
        # step 02: inject
        variables = inject_masks(variables, masks)
        save_checkpoint({"model": variables}, False, args.out_dir,
                        f"direct_mask_{int(args.ratio * 100)}")

    eff, total = count_effective_params(variables,
                                        variables.get("masks"))
    logger.info("effective params before merge: %s / %s "
                "(%.1f%% of dense)", f"{eff:,}", f"{total:,}",
                100.0 * eff / max(total, 1))

    # step 03: BN-fold + mask fold -> dense fused deployment tree
    merged = merge_for_deployment(variables, eps=args.eps)
    name = (f"merged_{int(args.ratio * 100)}" if args.ratio > 0
            else "fused_dense")
    save_checkpoint({"model": merged}, False, args.out_dir, name)
    eff2, total2 = count_effective_params(merged)
    logger.info("deployment tree: %s nonzero / %s total", f"{eff2:,}",
                f"{total2:,}")

    if args.slim and "masks" in variables:
        import json

        slimmed, spec = slim_channels(merged, variables["masks"])
        save_checkpoint({"model": slimmed}, False, args.out_dir,
                        name + "_slim")
        spec_path = os.path.join(args.out_dir, name + "_slim_spec.json")
        with open(spec_path, "w") as f:
            json.dump(spec, f)
        logger.info("wrote channel-slimmed tree + %s (%d csp layers)",
                    spec_path, len(spec))


if __name__ == "__main__":
    main()
