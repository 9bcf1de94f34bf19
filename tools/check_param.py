#!/usr/bin/env python3
"""Weight-magnitude histogram / CDF of a checkpoint + hard-threshold cut.

Parity target: ref check_param.py:1-40 (magnitude histogram of a merged
checkpoint, hard cut at a threshold).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("check_param")
    ap.add_argument("-c", "--ckpt", required=True)
    ap.add_argument("--threshold", type=float, default=0.001)
    ap.add_argument("--bins", type=int, default=20)
    args = ap.parse_args()

    from flax.traverse_util import flatten_dict

    from cocodet_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    tree = ckpt.get("model", ckpt)
    params = tree.get("params", tree)
    flat = flatten_dict(params)
    kernels = [np.abs(np.asarray(v)).ravel() for k, v in flat.items()
               if k[-1] == "kernel" and np.ndim(v) == 4]
    allw = np.concatenate(kernels)

    print(f"{allw.size:,} conv weights | mean |w| {allw.mean():.4e} | "
          f"max {allw.max():.4e}")
    qs = np.percentile(allw, np.linspace(0, 100, args.bins + 1))
    counts, _ = np.histogram(allw, bins=qs)
    cum = 0
    for i in range(args.bins):
        cum += counts[i]
        print(f"  |w| < {qs[i + 1]:.4e}: {100 * cum / allw.size:5.1f}% cum")
    below = int((allw < args.threshold).sum())
    print(f"hard cut |w| < {args.threshold}: removes {below:,} "
          f"({100 * below / allw.size:.1f}%)")


if __name__ == "__main__":
    main()
