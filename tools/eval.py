#!/usr/bin/env python3
"""Evaluation CLI.

Parity target: ref tools/eval.py:20-211 (conf/nms/tsize overrides, --fuse
BN-fold, --speed latency-only mode, --test test-dev). The --trt branch maps
to the AOT-compiled serving path (tools/export_aot.py artifacts).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu eval")
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("-c", "--ckpt", default=None,
                   help="checkpoint (.msgpack or reference .pth)")
    p.add_argument("--conf", type=float, default=None)
    p.add_argument("--nms", type=float, default=None)
    p.add_argument("--tsize", type=int, default=None)
    p.add_argument("--slim-spec", default=None,
                   help="channel-slim spec json (compress_pipeline --slim "
                        "output); evaluates the genuinely narrower model")
    p.add_argument("--fuse", action="store_true",
                   help="fold BN into conv weights before eval")
    p.add_argument("--speed", action="store_true",
                   help="latency benchmark only (no mAP)")
    p.add_argument("--test", action="store_true", help="test-dev set")
    # multi-host (ref tools/eval.py:40-60 --num_machines/--machine_rank/
    # --dist-url): one jax process per host, detections allgathered over DCN
    p.add_argument("--dist-coordinator", default=None,
                   help="host:port of process 0 (jax.distributed)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def main():
    args = make_parser().parse_args()

    if args.num_processes and args.num_processes > 1:
        # must run before any jax device query
        from cocodet_tpu.parallel import initialize_distributed

        initialize_distributed(args.dist_coordinator, args.num_processes,
                               args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cocodet_tpu.exp import get_exp
    from cocodet_tpu.utils.logger import logger

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nms_threshold = args.nms
    if args.tsize is not None:
        exp.test_size = (args.tsize, args.tsize)

    if args.slim_spec:
        from cocodet_tpu.compress import load_slim_spec
        from cocodet_tpu.models import build_model

        spec = load_slim_spec(args.slim_spec)
        model = build_model(exp.model_name, num_classes=exp.num_classes,
                            depth=exp.depth, width=exp.width, fused=True,
                            slim=spec)
        logger.info("channel-slim spec: %d entries", len(spec))
    else:
        model = exp.get_model(fused=args.fuse)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, *exp.test_size, 3), jnp.float32)

    if args.ckpt and args.ckpt.endswith(".pth"):
        from cocodet_tpu.utils.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(
            args.ckpt, variant=exp.model_name.replace("yolox-", ""))
    elif args.ckpt:
        from cocodet_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(args.ckpt)
        variables = ckpt.get("model", ckpt)
    else:
        variables = jax.jit(model.init)(rng, sample)
        logger.warning("no checkpoint: evaluating random weights")

    if args.fuse and "batch_stats" in variables:
        from cocodet_tpu.ops.fuse import fuse_batchnorm

        variables = fuse_batchnorm(variables, eps=exp.bn_eps)
        logger.info("BN folded into conv weights")

    if args.speed:
        import time

        from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

        cfg = PostprocessConfig(conf_threshold=exp.test_conf,
                                nms_threshold=exp.nms_threshold)

        @jax.jit
        def fwd(imgs):
            return postprocess(model.apply(variables, imgs),
                               exp.strides, cfg)

        imgs = jnp.asarray(
            np.random.rand(args.batch_size, *exp.test_size, 3) * 255,
            jnp.float32)
        jax.block_until_ready(fwd(imgs))
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(imgs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        logger.info("speed: %.2f img/s, %.2f ms/batch",
                    args.batch_size * n / dt, 1000 * dt / n)
        return

    evaluator = exp.get_evaluator(batch_size=args.batch_size,
                                  testdev=args.test)
    ap, ap50, summary = evaluator.evaluate(exp, variables, model=model)
    logger.info(summary)
    print(f"AP50:95 = {ap:.4f}  AP50 = {ap50:.4f}")


if __name__ == "__main__":
    main()
