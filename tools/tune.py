#!/usr/bin/env python3
"""tune CLI — same argparse surface as tools/train.py but running the
Tuner (fine-tune w/ optional distillation, ref tools/tune.py:13,109) runtime."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train import make_parser  # noqa: E402


def main():
    args = make_parser().parse_args()

    from cocodet_tpu.exp import get_exp
    from cocodet_tpu.parallel import initialize_distributed
    from cocodet_tpu.core import Tuner

    initialize_distributed(args.coordinator, args.num_hosts, args.host_id)
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.experiment_name:
        exp.exp_name = args.experiment_name

    Tuner(exp, args).train()


if __name__ == "__main__":
    main()
