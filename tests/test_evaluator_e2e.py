"""End-to-end COCOEvaluator test on synthetic data.

A fake model emits raw head maps that decode exactly to the GT boxes of a
synthetic COCO dataset -> the whole chain (letterbox -> decode -> NMS ->
scale-back -> 80->91 id map -> mAP) must yield AP = 1.0. Misplaced boxes
must yield AP = 0. This exercises the exact pipeline of
tools/eval.py / ref coco_evaluator.py:51-221 without weights.
"""

import json
import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cocodet_tpu.data.coco import COCO_CLASS_ID, COCODataset
from cocodet_tpu.data.transforms import ValTransform
from cocodet_tpu.evaluators import COCOEvaluator


class FakeExp:
    strides = (8, 16, 32)

    def get_model(self):
        raise AssertionError("evaluator must use the passed model")


class CraftedModel:
    """Emits raw maps decoding to one box per image at a known location.

    The evaluator jits its step function, so outputs must be a traced
    function of the input pixels (a python-side counter would be baked in
    at trace time and replayed for every same-shape batch). Each synthetic
    image is filled with the constant 30*(img_idx+1); the model decodes the
    index from the mean pixel and gathers that image's precomputed maps.
    Padding rows (0 or 114 fill) map to an empty entry.
    """

    def __init__(self, boxes_per_image, num_classes=80, size=(64, 64)):
        # boxes_per_image: img_index -> (cx, cy, w, h, cls) in letterboxed px
        self.boxes = boxes_per_image
        self.num_classes = num_classes
        self.size = size

    def _tables(self, h, w):
        n = max(self.boxes) + 1
        tables = []
        for s in (8, 16, 32):
            tables.append({
                "reg": np.zeros((n + 1, h // s, w // s, 4), np.float32),
                "obj": np.full((n + 1, h // s, w // s, 1), -20.0, np.float32),
                "cls": np.full((n + 1, h // s, w // s, self.num_classes),
                               -20.0, np.float32),
            })
        for idx, (cx, cy, bw, bh, cls) in self.boxes.items():
            s = 8
            gx = min(int(cx // s), w // s - 1)
            gy = min(int(cy // s), h // s - 1)
            tables[0]["reg"][idx, gy, gx] = [cx / s - gx, cy / s - gy,
                                             math.log(bw / s),
                                             math.log(bh / s)]
            tables[0]["obj"][idx, gy, gx, 0] = 20.0
            tables[0]["cls"][idx, gy, gx, cls] = 20.0
        return tables

    def apply(self, variables, images):
        b, h, w, _ = images.shape
        n = max(self.boxes) + 1
        tables = self._tables(h, w)
        # decode image index from the constant fill value 30*(idx+1);
        # use the top-left pixel — letterboxing anchors content there, so
        # it is never the 114 pad value
        corner = images[:, 0, 0, 0]
        idx = jnp.round(corner / 30.0).astype(jnp.int32) - 1
        idx = jnp.where((idx < 0) | (idx >= n), n, idx)  # padding -> empty
        outs = []
        for t in tables:
            outs.append({k: jnp.take(jnp.asarray(v), idx, axis=0)
                         for k, v in t.items()})
        return outs


@pytest.fixture
def fake_coco(tmp_path):
    """3 synthetic images + annotations, one GT box each."""
    import cv2

    img_dir = tmp_path / "val2017"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()

    images, annotations = [], []
    gt = {}
    sizes = [(100, 80), (60, 120), (90, 90)]  # (h, w) originals
    for i, (h, w) in enumerate(sizes):
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(img_dir / name),
                    np.full((h, w, 3), 30 * (i + 1), np.uint8))
        images.append({"id": i, "width": w, "height": h, "file_name": name})
        # GT box in original pixels
        x, y, bw, bh = w * 0.25, h * 0.25, w * 0.4, h * 0.4
        annotations.append({
            "id": i, "image_id": i, "category_id": COCO_CLASS_ID[i],
            "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
        gt[i] = (x, y, bw, bh, i)

    categories = [{"id": c, "name": str(c)} for c in COCO_CLASS_ID]
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return tmp_path, gt, sizes


def _crafted_boxes(gt, sizes, input_size=(64, 64)):
    """GT boxes mapped into letterboxed model-input pixels (cxcywh)."""
    out = {}
    for i, (x, y, bw, bh, cls) in gt.items():
        h, w = sizes[i]
        r = min(input_size[0] / h, input_size[1] / w)
        out[i] = ((x + bw / 2) * r, (y + bh / 2) * r, bw * r, bh * r, cls)
    return out


def test_evaluator_perfect_detections(fake_coco):
    root, gt, sizes = fake_coco
    ds = COCODataset(data_dir=str(root), json_file="instances_val2017.json",
                     name="val2017", img_size=(64, 64),
                     preproc=ValTransform())
    ev = COCOEvaluator(ds, img_size=(64, 64), conf_threshold=0.01,
                       batch_size=2, pre_nms_topk=64, max_det=10)
    model = CraftedModel(_crafted_boxes(gt, sizes))
    ap, ap50, summary = ev.evaluate(FakeExp(), {}, model=model)
    assert ap50 == pytest.approx(1.0), summary
    assert ap >= 0.99, summary


def test_evaluator_misplaced_detections(fake_coco):
    root, gt, sizes = fake_coco
    ds = COCODataset(data_dir=str(root), json_file="instances_val2017.json",
                     name="val2017", img_size=(64, 64),
                     preproc=ValTransform())
    ev = COCOEvaluator(ds, img_size=(64, 64), conf_threshold=0.01,
                       batch_size=2, pre_nms_topk=64, max_det=10)
    # shift every box far away
    wrong = {i: (cx, cy, bw, bh, cls) for i, (cx, cy, bw, bh, cls)
             in _crafted_boxes(gt, sizes).items()}
    wrong = {i: (5.0, 5.0, 4.0, 4.0, cls)
             for i, (_, _, _, _, cls) in wrong.items()}
    model = CraftedModel(wrong)
    ap, ap50, _ = ev.evaluate(FakeExp(), {}, model=model)
    assert ap50 < 0.2


def test_dataset_contract(fake_coco):
    root, gt, sizes = fake_coco
    ds = COCODataset(data_dir=str(root), json_file="instances_val2017.json",
                     name="val2017", img_size=(64, 64))
    img, res, info, img_id = ds[0]
    assert info == sizes[0]
    assert img_id == 0
    assert res.shape[1] == 5  # xyxy + class, scaled to img_size
    r = min(64 / sizes[0][0], 64 / sizes[0][1])
    x, y, bw, bh, _ = gt[0]
    np.testing.assert_allclose(res[0, :4],
                               [x * r, y * r, (x + bw) * r, (y + bh) * r],
                               rtol=1e-5)
