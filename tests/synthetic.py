"""Synthetic COCO dataset builder shared by runtime tests."""

import json
import os

import numpy as np


def make_fake_coco(root, n_images=8, size=96, seed=0):
    """Writes train2017/val2017 images + annotations; returns root."""
    import cv2

    rs = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    for split in ("train2017", "val2017"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        images, annotations = [], []
        for i in range(n_images):
            h = int(rs.randint(60, size))
            w = int(rs.randint(60, size))
            img = np.full((h, w, 3), 120, np.uint8)
            x, y = w * 0.2, h * 0.2
            bw, bh = w * 0.5, h * 0.5
            cv2.rectangle(img, (int(x), int(y)), (int(x + bw), int(y + bh)),
                          (255, 255, 255), -1)
            name = f"{i:012d}.jpg"
            cv2.imwrite(os.path.join(root, split, name), img)
            images.append({"id": i, "width": w, "height": h,
                           "file_name": name})
            annotations.append({
                "id": i, "image_id": i, "category_id": 1,
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
        cats = [{"id": c, "name": str(c)} for c in range(1, 91)]
        with open(os.path.join(root, "annotations",
                               f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": cats}, f)
    return root
