"""Image-folder inference dataset with aspect-ratio bucketing.

Parity target: ref choijhanyangackr/yolox_infer/dataset.py:14-54 +
preprocess_utils.py:9-55:
  - files sorted by aspect ratio h/w (batch-shape bucketing),
  - ratio-preserving resize to the long side, BGR, NO normalization,
  - batch collate pads to the per-batch max rounded up to x64 (or x32),
    114-filled, top-left anchored.

TPU deviations: NHWC output (not NCHW); to bound XLA recompiles the padded
batch shape is additionally snapped to a fixed bucket grid (multiples of 64
up to img_size), giving at most (img_size/64)^2 distinct shapes per run —
in practice a handful, each compiled once.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence, Tuple

import cv2
import numpy as np

IMG_EXT = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp"}


def list_images(data_dir: str) -> List[Tuple[str, int, int]]:
    """(filename, h, w) for every image in the folder."""
    out = []
    for f in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, f)
        if not os.path.isfile(path) or f.split(".")[-1].lower() not in IMG_EXT:
            continue
        # header-only size probe where possible; cv2 fallback reads fully
        img = cv2.imread(path)
        if img is None:
            continue
        h, w = img.shape[:2]
        out.append((f, h, w))
    return out


class ImageFolderDataset:
    """Aspect-sorted image folder (ref dataset.py:31)."""

    def __init__(self, data_dir: str, img_size: int):
        self.data_dir = data_dir
        self.img_size = img_size
        files = list_images(data_dir)
        files.sort(key=lambda t: t[1] / t[2])  # by h/w
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        name, h, w = self.files[idx]
        img = cv2.imread(os.path.join(self.data_dir, name))  # BGR
        if w > h:
            nw, nh = self.img_size, int(h * self.img_size / w)
        else:
            nh, nw = self.img_size, int(w * self.img_size / h)
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        return resized, (h, w, name, nh, nw)


def collate_batch(img_size: int, items: Sequence, pad_multiple: int = 64,
                  fixed_shape: bool = True):
    """Pad a list of resized images to one NHWC float32 batch.

    fixed_shape=True snaps to the bucket grid (multiples of pad_multiple) to
    avoid a new XLA compile per batch; False reproduces the reference's
    per-batch max exactly.
    """
    max_h = max(it[1][3] for it in items)
    max_w = max(it[1][4] for it in items)
    mult = pad_multiple if img_size % 64 == 0 else 32
    max_h = int(math.ceil(max_h / mult) * mult)
    max_w = int(math.ceil(max_w / mult) * mult)

    batch = np.full((len(items), max_h, max_w, 3), 114, np.uint8)
    infos = []
    for i, (img, (h, w, name, nh, nw)) in enumerate(items):
        batch[i, :nh, :nw] = img
        infos.append((h, w, name))
    return np.ascontiguousarray(batch, np.float32), infos


class FolderLoader:
    """Simple batched iterator over ImageFolderDataset."""

    def __init__(self, dataset: ImageFolderDataset, batch_size: int,
                 pad_multiple: int = 64):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_multiple = pad_multiple

    def __iter__(self):
        n = len(self.dataset)
        for start in range(0, n, self.batch_size):
            items = [self.dataset[i]
                     for i in range(start, min(start + self.batch_size, n))]
            imgs, infos = collate_batch(self.dataset.img_size, items,
                                        self.pad_multiple)
            # pad the batch dim to a fixed size so the jit signature is stable
            if len(items) < self.batch_size:
                pad = self.batch_size - len(items)
                imgs = np.concatenate(
                    [imgs, np.full((pad,) + imgs.shape[1:], 114.0,
                                   np.float32)])
            yield imgs, infos
