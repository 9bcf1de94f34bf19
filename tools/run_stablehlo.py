#!/usr/bin/env python3
"""Run an exported StableHLO detector artifact on a folder of images.

Role parity: ref demo/ONNXRuntime/onnx_inference.py (load exported model,
letterbox, run, numpy decode+NMS, draw). The artifact comes from
tools/export_stablehlo.py; when it was exported with --decode the graph
already returns final detections, otherwise the numpy demo decode
(utils/demo_utils.py) is applied — exactly the reference's split between
in-graph and external decode (ref yolo_head.py:29 decode_in_inference).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser("run_stablehlo")
    ap.add_argument("artifact")
    ap.add_argument("--image", required=True)
    ap.add_argument("--tsize", type=int, default=640)
    ap.add_argument("--p6", action="store_true", default=True)
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--nms", type=float, default=0.45)
    ap.add_argument("--out", default=None, help="write visualization here")
    args = ap.parse_args()

    import cv2
    import jax
    from jax import export as jexport

    from cocodet_tpu.data.coco import COCO_CLASSES
    from cocodet_tpu.data.transforms import letterbox
    from cocodet_tpu.utils.demo_utils import demo_postprocess, multiclass_nms
    from cocodet_tpu.utils.visualize import vis

    from cocodet_tpu.ops.nms import register_export_serialization

    register_export_serialization()  # decoded artifacts return NMSResult
    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    print(f"loaded {args.artifact}: in {exported.in_avals}, "
          f"platforms {exported.platforms}")

    img = cv2.imread(args.image)
    assert img is not None, args.image
    padded, ratio = letterbox(img, (args.tsize, args.tsize))
    out = exported.call(padded[None])

    if isinstance(out, (list, tuple)) and isinstance(out[0], (list, tuple)):
        # raw per-level (reg, obj, cls) maps -> numpy demo decode path
        flat = []
        for reg, obj, cls in out:
            b, h, w, _ = reg.shape
            cat = np.concatenate([np.asarray(reg), np.asarray(obj),
                                  np.asarray(cls)], axis=-1)
            flat.append(cat.reshape(b, h * w, -1))
        preds = np.concatenate(flat, axis=1)
        preds = demo_postprocess(preds, (args.tsize, args.tsize), p6=args.p6)
        boxes = preds[0, :, :4]
        scores = (1 / (1 + np.exp(-preds[0, :, 4:5]))) * \
                 (1 / (1 + np.exp(-preds[0, :, 5:])))
        xyxy = np.concatenate([boxes[:, :2] - boxes[:, 2:] / 2,
                               boxes[:, :2] + boxes[:, 2:] / 2], axis=1)
        dets = multiclass_nms(xyxy, scores, args.nms, args.conf)
        if dets is None:
            print("no detections")
            return
        boxes_v, scores_v, cls_v = dets[:, :4] / ratio, dets[:, 4], dets[:, 5]
    else:
        res = jax.device_get(out)
        valid = res.valid[0]
        boxes_v = res.boxes[0][valid] / ratio
        scores_v = res.scores[0][valid]
        cls_v = res.classes[0][valid]

    for b, s, c in zip(boxes_v, scores_v, cls_v):
        name = COCO_CLASSES[int(c)] if int(c) < 80 else str(int(c))
        print(f"{name:16s} {s:.3f} [{b[0]:.0f}, {b[1]:.0f}, "
              f"{b[2]:.0f}, {b[3]:.0f}]")
    if args.out:
        cv2.imwrite(args.out, vis(img, boxes_v, scores_v, cls_v,
                                  conf=args.conf, class_names=COCO_CLASSES))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
