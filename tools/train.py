#!/usr/bin/env python3
"""Training CLI.

Parity target: ref tools/train.py:18-133 (argparse surface: batch-size,
fp16, cache, resume, ckpt, experiment by file or name, trailing key-value
overrides). Flags tied to torch internals (devices-per-node spawn, occupy,
dist-backend/url) are replaced by the jax runtime: one process per host,
`--coordinator/--num-hosts/--host-id` for multi-host (SURVEY.md §2.6).
"""

import argparse
import os
import random
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu train")
    p.add_argument("-expn", "--experiment-name", default=None)
    p.add_argument("-n", "--name", default=None, help="registry exp name")
    p.add_argument("-f", "--exp_file", default=None, help="exp file path")
    p.add_argument("-b", "--batch-size", type=int, default=64)
    p.add_argument("--resume", action="store_true")
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("-e", "--start_epoch", type=int, default=None)
    p.add_argument("--cache", action="store_true",
                   help="cache decoded images in RAM")
    p.add_argument("--fp32", action="store_true",
                   help="disable bf16 compute (bf16 is the default AMP)")
    p.add_argument("--no-aug", dest="no_aug", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="trailing key value pairs override exp attrs")
    return p


def main():
    args = make_parser().parse_args()

    from cocodet_tpu.exp import get_exp
    from cocodet_tpu.parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_hosts, args.host_id)

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.experiment_name:
        exp.exp_name = args.experiment_name
    if args.seed is not None:
        exp.seed = args.seed
        random.seed(args.seed)
        warnings.warn("fixed seed set: throughput may vary run to run only "
                      "through host-side data order")
    if args.fp32:
        exp.compute_dtype = "float32"

    from cocodet_tpu.core.trainer import Trainer

    Trainer(exp, args).train()


if __name__ == "__main__":
    main()
