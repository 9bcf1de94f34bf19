#!/usr/bin/env python3
"""Image/video/folder demo predictor.

Parity target: ref tools/demo.py:22-313 (Predictor: preproc -> forward ->
postprocess -> vis; image / folder / video / webcam modes; result saving).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu demo")
    p.add_argument("demo", choices=["image", "video", "webcam"],
                   nargs="?", default="image")
    p.add_argument("-n", "--name", default="yolox-m-p6")
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("--path", default="./assets", help="image/video path")
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--nms", type=float, default=0.45)
    p.add_argument("--tsize", type=int, default=640)
    p.add_argument("--fuse", action="store_true")
    p.add_argument("--save_result", action="store_true")
    p.add_argument("--output-dir", default="./demo_outputs")
    return p


class Predictor:
    def __init__(self, exp, args):
        import jax
        import jax.numpy as jnp

        from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

        self.exp = exp
        self.size = (args.tsize, args.tsize)
        self.model = exp.get_model(fused=args.fuse)
        if args.ckpt:
            if args.ckpt.endswith(".pth"):
                from cocodet_tpu.utils.torch_import import load_torch_checkpoint
                self.variables = load_torch_checkpoint(args.ckpt)
            else:
                from cocodet_tpu.utils.checkpoint import load_checkpoint
                ckpt = load_checkpoint(args.ckpt)
                self.variables = ckpt.get("model", ckpt)
            if args.fuse and "batch_stats" in self.variables:
                from cocodet_tpu.ops.fuse import fuse_batchnorm
                self.variables = fuse_batchnorm(self.variables, exp.bn_eps)
        else:
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, *self.size, 3)))

        cfg = PostprocessConfig(conf_threshold=args.conf,
                                nms_threshold=args.nms, pre_nms_topk=1000,
                                max_det=100)

        @jax.jit
        def _step(images):
            return postprocess(self.model.apply(self.variables, images),
                               exp.strides, cfg)

        self.step = _step

    def inference(self, img_bgr):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from cocodet_tpu.data.transforms import letterbox

        padded, ratio = letterbox(img_bgr, self.size)
        res = jax.block_until_ready(
            self.step(jnp.asarray(padded[None])))
        boxes = np.asarray(res.boxes)[0] / ratio
        return (boxes, np.asarray(res.scores)[0],
                np.asarray(res.classes)[0], np.asarray(res.valid)[0])

    def visual(self, img, result, conf):
        from cocodet_tpu.data.coco import COCO_CLASSES
        from cocodet_tpu.utils.visualize import vis

        boxes, scores, classes, valid = result
        return vis(img, boxes[valid], scores[valid], classes[valid],
                   conf=conf, class_names=COCO_CLASSES)


def image_demo(predictor, args):
    import cv2

    paths = ([os.path.join(args.path, f) for f in sorted(os.listdir(args.path))]
             if os.path.isdir(args.path) else [args.path])
    os.makedirs(args.output_dir, exist_ok=True)
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            continue
        t0 = time.perf_counter()
        result = predictor.inference(img)
        print(f"{p}: {int(result[3].sum())} dets in "
              f"{time.perf_counter() - t0:.3f}s")
        if args.save_result:
            out = predictor.visual(img, result, args.conf)
            cv2.imwrite(os.path.join(args.output_dir, os.path.basename(p)),
                        out)


def video_demo(predictor, args):
    import cv2

    cap = cv2.VideoCapture(args.path if args.demo == "video" else 0)
    writer = None
    os.makedirs(args.output_dir, exist_ok=True)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = predictor.inference(frame)
        out = predictor.visual(frame, result, args.conf)
        if args.save_result:
            if writer is None:
                fps = cap.get(cv2.CAP_PROP_FPS) or 30
                writer = cv2.VideoWriter(
                    os.path.join(args.output_dir, "out.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), fps,
                    (out.shape[1], out.shape[0]))
            writer.write(out)
    cap.release()
    if writer:
        writer.release()


def main():
    args = make_parser().parse_args()
    if os.environ.get("COCODET_FORCE_CPU"):
        # CI/headless hook: keep the demo off the (single-client) TPU tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")
    from cocodet_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    predictor = Predictor(exp, args)
    if args.demo == "image":
        image_demo(predictor, args)
    else:
        video_demo(predictor, args)


if __name__ == "__main__":
    main()
