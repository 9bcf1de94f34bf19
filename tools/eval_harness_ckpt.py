#!/usr/bin/env python3
"""Score any deployment checkpoint (bf16 / slim / int8) on a COCO-layout
val folder through the submission harness — the same stage-6 self-eval
that tools/run_pipeline.py runs, factored out so offline artifacts
(e.g. tools/quantize_model.py output) get an AP number on demand.

Usage:
  python tools/eval_harness_ckpt.py -c .../pipe_int8_ckpt.msgpack \
      --slim-spec .../pipe_slim_spec.json --quant w8a8 \
      --data-dir /tmp/cocodet_synth_coco --img-size 320 [--cpu]
"""

import argparse
import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "harness"))


def main():
    ap = argparse.ArgumentParser("eval_harness_ckpt")
    ap.add_argument("-c", "--ckpt", required=True)
    ap.add_argument("--data-dir", required=True,
                    help="COCO-layout root (val2017/ + annotations/)")
    ap.add_argument("--slim-spec", default=None)
    ap.add_argument("--quant", default=None, choices=[None, "w8a8"])
    ap.add_argument("--depth", type=float, default=0.33)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("-b", "--batch-size", type=int, default=8)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--nms", type=float, default=0.65)
    ap.add_argument("--half", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="bf16 model compute (--no-half for float32)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-o", "--out", default=None,
                    help="detections json path (default: alongside ckpt)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import importlib

    hmain = importlib.import_module("main")
    from cocodet_tpu.evaluators.coco_metric import score_detections_json

    cfg = {
        "model": {"type": "yolox-p6", "depth": args.depth,
                  "width": args.width},
        "ckpt": args.ckpt,
        "slim_spec": args.slim_spec,
        "quant": args.quant,
        "img_size": args.img_size,
        "half": args.half,
        "data_dir": os.path.join(args.data_dir, "val2017"),
        "dataloader": {"batch_size": args.batch_size},
        "postprocess": {"conf_threshold": args.conf,
                        "nms_threshold": args.nms, "use_pallas": False},
        "input_aug": False,
    }
    out_json = args.out or (os.path.splitext(args.ckpt)[0]
                            + "_detections.json")
    hmain.run(cfg, out_json)

    stats = score_detections_json(
        os.path.join(args.data_dir, "annotations", "instances_val2017.json"),
        out_json)
    result = {"ckpt": args.ckpt, "quant": args.quant,
              "mAP": stats["AP"], "AP50": stats["AP50"]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
