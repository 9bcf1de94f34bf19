"""Rich procedural synthetic dataset: COCO-format validity and stack
compatibility (reader, mosaic, train transform)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from cocodet_tpu.data.synthetic import make_synthetic_coco

    return make_synthetic_coco(
        str(tmp_path_factory.mktemp("synth")), n_train=8, n_val=4,
        size_range=(160, 256), seed=3)


def test_coco_format_valid(synth_root):
    from cocodet_tpu.data.coco import COCO_CLASS_ID
    from cocodet_tpu.data.synthetic import SYNTH_CLASSES

    with open(os.path.join(synth_root, "annotations",
                           "instances_train2017.json")) as f:
        d = json.load(f)
    assert len(d["images"]) == 8
    assert len(d["categories"]) == len(SYNTH_CLASSES)
    cat_ids = {c["id"] for c in d["categories"]}
    assert cat_ids == set(COCO_CLASS_ID[:len(SYNTH_CLASSES)])
    by_img = {im["id"]: im for im in d["images"]}
    assert d["annotations"], "every split must have annotations"
    for ann in d["annotations"]:
        im = by_img[ann["image_id"]]
        x, y, w, h = ann["bbox"]
        assert ann["category_id"] in cat_ids
        assert w > 0 and h > 0
        assert 0 <= x and x + w <= im["width"] + 1e-6
        assert 0 <= y and y + h <= im["height"] + 1e-6


def test_variants(tmp_path):
    """Occlusion / crowding / texture variants generate valid datasets with
    the intended statistics (VERDICT r2 item 10)."""
    import cv2

    from cocodet_tpu.data.synthetic import make_synthetic_coco

    stats = {}
    for variant in ("default", "occlusion", "crowding", "texture", "mixed"):
        root = make_synthetic_coco(
            str(tmp_path / variant), n_train=12, n_val=2,
            size_range=(160, 224), seed=5, variant=variant)
        with open(os.path.join(root, "annotations",
                               "instances_train2017.json")) as f:
            d = json.load(f)
        assert d["annotations"]
        for ann in d["annotations"]:
            assert ann["bbox"][2] > 0 and ann["bbox"][3] > 0
        img = cv2.imread(os.path.join(root, "train2017",
                                      d["images"][0]["file_name"]))
        assert img is not None and img.ndim == 3
        stats[variant] = len(d["annotations"]) / len(d["images"])
    # crowding must actually crowd
    assert stats["crowding"] > 1.5 * stats["default"]


def test_new_variants_smallobj_lowlight(tmp_path):
    """The held-out eval axes added in round 4: smallobj keeps every box in
    the P3 tail; lowlight crushes global brightness.  Both must stay OUT of
    the 'mixed' training composition (chain_mixed cross-round
    comparability), which test_variants pins implicitly via _MIX."""
    import cv2

    from cocodet_tpu.data.synthetic import _MIX, make_synthetic_coco

    assert set(_MIX) == {"default", "occlusion", "crowding", "texture"}

    roots = {}
    for variant in ("default", "smallobj", "lowlight"):
        roots[variant] = make_synthetic_coco(
            str(tmp_path / variant), n_train=10, n_val=2,
            size_range=(192, 256), seed=11, variant=variant)

    def load(variant):
        with open(os.path.join(roots[variant], "annotations",
                               "instances_train2017.json")) as f:
            return json.load(f)

    # smallobj: every box side below ~12% of the (min) image side, and
    # denser than default
    d_small, d_def = load("smallobj"), load("default")
    assert d_small["annotations"]
    by_img = {im["id"]: im for im in d_small["images"]}
    for ann in d_small["annotations"]:
        im = by_img[ann["image_id"]]
        lim = 0.20 * min(im["width"], im["height"])  # 0.10 scale * ar jitter
        assert ann["bbox"][2] <= lim and ann["bbox"][3] <= lim, ann
    assert (len(d_small["annotations"]) / len(d_small["images"])
            > len(d_def["annotations"]) / len(d_def["images"]))

    # lowlight: mean brightness well below default's
    def mean_brightness(variant, d):
        vals = [cv2.imread(os.path.join(roots[variant], "train2017",
                                        im["file_name"])).mean()
                for im in d["images"]]
        return float(np.mean(vals))

    assert mean_brightness("lowlight", load("lowlight")) \
        < 0.65 * mean_brightness("default", d_def)


def test_deterministic(synth_root, tmp_path):
    from cocodet_tpu.data.synthetic import make_synthetic_coco

    again = make_synthetic_coco(str(tmp_path / "again"), n_train=8, n_val=4,
                                size_range=(160, 256), seed=3)
    for split in ("train2017", "val2017"):
        with open(os.path.join(synth_root, "annotations",
                               f"instances_{split}.json")) as f:
            a = json.load(f)
        with open(os.path.join(again, "annotations",
                               f"instances_{split}.json")) as f:
            b = json.load(f)
        assert a == b


def test_dataset_and_mosaic_roundtrip(synth_root):
    import random

    from cocodet_tpu.data import MosaicDetection, TrainTransform
    from cocodet_tpu.data.coco import COCODataset

    ds = COCODataset(data_dir=synth_root, json_file="instances_train2017.json",
                     name="train2017", img_size=(128, 128))
    img, tgt, _, _ = ds.pull_item(0)
    assert img.ndim == 3 and img.shape[2] == 3
    assert tgt.ndim == 2 and tgt.shape[1] == 5
    assert (tgt[:, 4] < 12).all() and (tgt[:, 4] >= 0).all()

    mosaic = MosaicDetection(
        ds, mosaic=True, img_size=(128, 128),
        preproc=TrainTransform(max_labels=50),
        degrees=10.0, translate=0.1, mosaic_scale=(0.5, 1.5),
        mixup_scale=(0.5, 1.5), shear=2.0, enable_mixup=True,
        mosaic_prob=1.0, mixup_prob=1.0, rng=random.Random(0))
    out, labels = mosaic.fetch((True, 0), random.Random(0))[:2]
    assert out.shape == (128, 128, 3)
    assert labels.shape == (50, 5)
    assert np.isfinite(labels).all()
