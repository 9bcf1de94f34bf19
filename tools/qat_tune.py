#!/usr/bin/env python3
"""Quantization-aware fine-tune (QAT) of a fused/slim deployment checkpoint.

The int8 recovery-tune counterpart of tools/quantize_model.py (PTQ): when
post-training rounding costs accuracy, a short fine-tune with the int8
numerics simulated in the forward pass (compress/qat.py fake-quant, STE
backward) lets SGD absorb the rounding error.  Output is the same w8a8
msgpack format the harness / StableHLO exporter consume.

Pipeline: calibrate act scales (same recipe as PTQ) -> fine-tune the float
params through the ``quant="qat"`` fused model on no-aug labeled batches
(the reference's recovery-tune pattern, ref yolox/core/tuner.py:37-416,
applied to the quantization axis) -> requantize to int8 -> save.

Usage:
  python tools/qat_tune.py -c outputs/.../pipe_merged_ckpt.msgpack \
      [--slim-spec outputs/.../pipe_slim_spec.json] \
      --data-dir /tmp/cocodet_synth_coco --img-size 320 -b 8 \
      --steps 300 --lr 1e-5 -o outputs/.../pipe_qat_ckpt.msgpack [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu int8 QAT fine-tune")
    p.add_argument("-c", "--ckpt", required=True,
                   help="fused deployment .msgpack (float, pre-quantization)")
    p.add_argument("-o", "--out", required=True, help="output w8a8 .msgpack")
    p.add_argument("-n", "--name", default="yolox-p6")
    p.add_argument("--depth", type=float, default=0.67)
    p.add_argument("--width", type=float, default=0.75)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--slim-spec", default=None)
    p.add_argument("--data-dir", required=True,
                   help="COCO-layout root (train2017/ + annotations/)")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--act-scales", choices=["tensor", "channel"],
                   default="channel",
                   help="activation-scale granularity.  'channel' (the "
                        "round-4 production PTQ recipe) trains against the "
                        "deployed per-channel fold grid (models/blocks.py "
                        "quant='qat' folds the vector exactly like "
                        "quantize_weights); 'tensor' reproduces the "
                        "round-3 QAT study grid.")
    p.add_argument("--ema-decay", type=float, default=0.999,
                   help="deploy an EMA shadow of the params instead of the "
                        "raw SGD iterate (0 disables). Slim checkpoints are "
                        "EMA/distill optima; raw QAT steps walk off them "
                        "(measured: lr sweep 1e-5/3e-6/1e-6 all score below "
                        "plain PTQ on the r3_chain_fix slim model)")
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--iou-type", default="giou",
                   help="recovery tunes use GIoU like the reference phase-2 "
                        "recipe (ref exps/p6/yolox_m_p6_tune.py)")
    p.add_argument("--print-interval", type=int, default=20)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the TPU tunnel alone)")
    return p


def data_loader(args):
    """No-aug labeled batches: plain letterbox TrainTransform, no mosaic —
    QAT is a recovery tune, run with the no-aug-tail settings."""
    from cocodet_tpu.exp import get_exp

    exp = get_exp(exp_name="yolox-m-p6")
    exp.depth, exp.width = args.depth, args.width
    exp.num_classes = args.num_classes
    exp.data_dir = args.data_dir
    exp.input_size = exp.test_size = (args.img_size, args.img_size)
    exp.multiscale_range = 0
    exp.data_num_workers = args.workers
    exp.mosaic_prob = 0.0
    exp.enable_mixup = False
    exp.seed = 0
    return exp.get_data_loader(args.batch_size, no_aug=True, seed=0)


def main():
    args = make_parser().parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from cocodet_tpu.compress import (build_quant_tree, calibrate,
                                      load_slim_spec, make_qat_step,
                                      quantization_report, requantize)
    from cocodet_tpu.models import MODEL_SPECS, build_model
    from cocodet_tpu.utils.checkpoint import load_checkpoint, load_matched
    from cocodet_tpu.utils.logger import logger

    slim = load_slim_spec(args.slim_spec) if args.slim_spec else None
    # f32 compute: the QAT forward simulates the deployed s8xs8->s32 path,
    # which bf16 intermediate rounding would blur
    kw = dict(num_classes=args.num_classes, depth=args.depth,
              width=args.width, fused=True, slim=slim)
    calib_model = build_model(args.name, quant="calib", **kw)
    qat_model = build_model(args.name, quant="qat", **kw)
    strides = MODEL_SPECS[args.name].strides

    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(jax.jit(calib_model.init)(jax.random.PRNGKey(0), x0))
    loaded = load_checkpoint(args.ckpt)
    tree = loaded.get("model", loaded)
    params = load_matched(variables["params"], tree.get("params", tree))

    loader = data_loader(args)
    data_iter = iter(loader)

    def next_batch():
        imgs, labels, _, _ = next(data_iter)
        return (jnp.asarray(np.asarray(imgs, np.float32)),
                jnp.asarray(np.asarray(labels, np.float32)))

    calib_imgs = []
    for _ in range(args.calib_batches):
        imgs, _ = next_batch()
        calib_imgs.append(imgs)
    logger.info("calibrating on %d batches of %s", len(calib_imgs),
                tuple(calib_imgs[0].shape))
    quant = build_quant_tree(
        calibrate(calib_model, {"params": params}, calib_imgs),
        per_channel_act=args.act_scales == "channel")

    # constant low LR + momentum: the reference's recovery-tune pattern
    # (phase-2 tune LR scaled way down, ROADMAP gentle-surgery finding:
    # aggressive LRs DIVERGE post-surgery models)
    tx = optax.sgd(args.lr, momentum=0.9, nesterov=True)
    opt_state = tx.init(params)
    step = make_qat_step(qat_model, tx, strides=strides,
                         num_classes=args.num_classes,
                         iou_type=args.iou_type, ema_decay=args.ema_decay)

    ema = None
    if args.ema_decay > 0.0:
        from cocodet_tpu.utils.ema import EMAState, ema_init

        # Anchor the shadow AT the (good) pre-tune params and skip the
        # from-scratch warmup ramp (1-exp(-t/2000) would make the shadow
        # chase the raw iterate for the whole 300-step tune): preset the
        # step counter far past the ramp so d == ema_decay from step one.
        ema = ema_init(params)
        ema = EMAState(shadow=ema.shadow,
                       updates=jnp.asarray(50_000, jnp.int32))

    t0 = time.perf_counter()
    for it in range(args.steps):
        imgs, labels = next_batch()
        params, opt_state, ema, metrics = step(params, opt_state, ema,
                                               quant, imgs, labels)
        if (it + 1) % args.print_interval == 0 or it == 0:
            m = jax.device_get(metrics)  # sync point
            logger.info(
                "qat step %d/%d loss %.4f (iou %.3f obj %.3f cls %.3f "
                "l1 %.3f) %.1f img/s", it + 1, args.steps,
                float(m["loss"]), float(m["iou_loss"]), float(m["obj_loss"]),
                float(m["cls_loss"]), float(m["l1_loss"]),
                args.batch_size * (it + 1) / (time.perf_counter() - t0))

    deploy = ema.shadow if ema is not None else params
    int8_params, quant_full = requantize(jax.device_get(deploy), quant)
    rep = quantization_report({"params": int8_params})
    logger.info("requantized: %s", json.dumps(rep))

    state = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(
            {"params": int8_params, "quant": quant_full}))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    logger.info("wrote %s (%.1f MB) — score it with tools/eval_harness_ckpt"
                " --quant w8a8", args.out, os.path.getsize(args.out) / 2**20)


if __name__ == "__main__":
    main()
