#!/usr/bin/env python3
"""Standalone ONNX inference demo (ref demo/ONNXRuntime/onnx_inference.py).

image -> letterbox preproc -> ONNX graph -> numpy grid decode
(demo_postprocess) -> multiclass NMS -> draw -> save, mirroring the
reference demo's flow and flags.  Backend: ``onnxruntime`` when the
package is importable, else the in-repo dependency-free numpy evaluator
(cocodet_tpu/utils/onnx_io.py) — this environment ships neither onnx nor
onnxruntime, and the demo must still run the artifact end-to-end.

Usage:
  python tools/export_onnx.py ... -o model.onnx          # make artifact
  python tools/onnx_demo.py -m model.onnx -i img.jpg \
      --input-shape 640,640 -o demo_out [--score-thr 0.3] [--no-p6]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu onnx demo")
    p.add_argument("-m", "--model", required=True, help=".onnx path")
    p.add_argument("-i", "--image", required=True, help="input image")
    p.add_argument("-o", "--output-dir", default="onnx_demo_out")
    p.add_argument("-s", "--score-thr", type=float, default=0.3)
    p.add_argument("--nms-thr", type=float, default=0.45)
    p.add_argument("--input-shape", default="640,640",
                   help="H,W the artifact was exported at")
    p.add_argument("--no-p6", action="store_true",
                   help="3-level (stride 8/16/32) model instead of P6")
    return p


def run_session(model_path: str, x: np.ndarray) -> np.ndarray:
    """session.run(['output'], {'images': x}) with backend fallback."""
    try:
        import onnxruntime as ort  # not in this image; used when present

        session = ort.InferenceSession(model_path)
        return session.run(["output"], {"images": x})[0]
    except ImportError:
        from cocodet_tpu.utils.onnx_io import load_onnx, run_onnx

        (out,) = run_onnx(load_onnx(model_path), {"images": x})
        return out


def main():
    import cv2

    from cocodet_tpu.data.transforms import letterbox
    from cocodet_tpu.utils.demo_utils import demo_postprocess, multiclass_nms
    from cocodet_tpu.utils.visualize import vis

    args = make_parser().parse_args()
    input_shape = tuple(int(v) for v in args.input_shape.split(","))

    origin = cv2.imread(args.image)
    if origin is None:
        raise FileNotFoundError(args.image)
    img, ratio = letterbox(origin.astype(np.uint8), input_shape)
    x = img.transpose(2, 0, 1)[None].astype(np.float32)  # CHW, no /255

    output = run_session(args.model, x)
    preds = demo_postprocess(output, input_shape, p6=not args.no_p6)[0]

    boxes = preds[:, :4]
    scores = preds[:, 4:5] * preds[:, 5:]
    boxes_xyxy = np.ones_like(boxes)
    boxes_xyxy[:, 0] = boxes[:, 0] - boxes[:, 2] / 2.0
    boxes_xyxy[:, 1] = boxes[:, 1] - boxes[:, 3] / 2.0
    boxes_xyxy[:, 2] = boxes[:, 0] + boxes[:, 2] / 2.0
    boxes_xyxy[:, 3] = boxes[:, 1] + boxes[:, 3] / 2.0
    boxes_xyxy /= ratio

    dets = multiclass_nms(boxes_xyxy, scores, nms_thr=args.nms_thr,
                          score_thr=args.score_thr)
    os.makedirs(args.output_dir, exist_ok=True)
    if dets is not None:
        out_img = vis(origin, dets[:, :4], dets[:, 4], dets[:, 5],
                      conf=args.score_thr)
        print(f"{len(dets)} detections")
    else:
        out_img = origin
        print("0 detections")
    out_path = os.path.join(args.output_dir, os.path.basename(args.image))
    cv2.imwrite(out_path, out_img)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
