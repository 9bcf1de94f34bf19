"""PASCAL VOC detection dataset (XML annotations).

Parity target: the reference's VOCDetection lives in the missing
yolox/data/datasets package (exercised by
ref exps/example/yolox_voc/yolox_voc_s.py:28-31); behavior rebuilt from the
upstream contract: VOC2007/2012 directory layout, image-set splits, XML
boxes with difficult-flag filtering, same item tuple as COCODataset.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def parse_voc_xml(path: str, keep_difficult: bool = False
                  ) -> Tuple[np.ndarray, List[int]]:
    """(N, 5) [x1 y1 x2 y2 class] + difficult flags."""
    root = ET.parse(path).getroot()
    boxes, difficult = [], []
    for obj in root.iter("object"):
        diff = int(obj.findtext("difficult", "0"))
        if diff and not keep_difficult:
            continue
        name = obj.findtext("name", "").lower().strip()
        if name not in VOC_CLASSES:
            continue
        bb = obj.find("bndbox")
        # VOC pixel indices are 1-based
        box = [float(bb.findtext(k)) - 1 for k in ("xmin", "ymin",
                                                   "xmax", "ymax")]
        boxes.append(box + [VOC_CLASSES.index(name)])
        difficult.append(diff)
    arr = (np.asarray(boxes, np.float32) if boxes
           else np.zeros((0, 5), np.float32))
    return arr, difficult


class VOCDetection:
    def __init__(self, data_dir: str,
                 image_sets: Sequence[Tuple[str, str]] = (("2007", "trainval"),
                                                          ("2012", "trainval")),
                 img_size: Tuple[int, int] = (640, 640), preproc=None,
                 keep_difficult: bool = False):
        self.data_dir = data_dir
        self.img_size = img_size
        self.preproc = preproc
        self.keep_difficult = keep_difficult
        self.items: List[Tuple[str, str]] = []  # (voc_root, image_id)
        for year, split in image_sets:
            root = os.path.join(data_dir, f"VOC{year}")
            lst = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
            with open(lst) as f:
                for line in f:
                    self.items.append((root, line.strip()))

    def __len__(self):
        return len(self.items)

    def pull_item(self, index: int):
        root, img_id = self.items[index]
        img = cv2.imread(os.path.join(root, "JPEGImages", f"{img_id}.jpg"))
        assert img is not None, (root, img_id)
        h, w = img.shape[:2]
        res, _ = parse_voc_xml(
            os.path.join(root, "Annotations", f"{img_id}.xml"),
            self.keep_difficult)
        r = min(self.img_size[0] / h, self.img_size[1] / w)
        img = cv2.resize(img, (int(w * r), int(h * r)),
                         interpolation=cv2.INTER_LINEAR)
        res = res.copy()
        res[:, :4] *= r
        return img, res, (h, w), index

    def __getitem__(self, index: int):
        img, target, info, idx = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.img_size)
        return img, target, info, idx
