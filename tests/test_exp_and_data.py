"""Exp config system + host-side data pipeline tests."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from cocodet_tpu.exp import get_exp, get_exp_by_name  # noqa: E402


REPO = os.path.join(os.path.dirname(__file__), "..")


def test_get_exp_by_file_and_merge():
    exp = get_exp(os.path.join(REPO, "exps", "p6", "yolox_m_p6.py"))
    assert exp.depth == 0.67 and exp.width == 0.75
    assert exp.input_size == (768, 768)
    assert exp.multiscale_range == (-4, 2)
    assert exp.ema_momentum == 0.9999
    # CLI merge with type coercion (ref base_exp.py:60-72)
    exp.merge(["max_epoch", "5", "basic_lr_per_img", "0.001",
               "iou_type", "giou"])
    assert exp.max_epoch == 5
    assert exp.basic_lr_per_img == 0.001
    assert exp.iou_type == "giou"
    with pytest.raises(AttributeError):
        exp.merge(["not_an_attr", "1"])


def test_exp_registry():
    exp = get_exp_by_name("yolox-m-p6")
    assert exp.model_name == "yolox-p6"
    assert exp.strides == (8, 16, 32, 64)
    s = get_exp_by_name("yolox-s")
    assert (s.depth, s.width) == (0.33, 0.50)
    nano = get_exp_by_name("yolox-nano")
    assert nano.model_name == "yolox-dw"


def test_exp_zoo_all_files_load():
    """Every file in exps/ constructs via the file factory (ref exps/ zoo
    incl. exps/example/custom/{nano,yolox_s}.py)."""
    import glob

    files = sorted(glob.glob(os.path.join(REPO, "exps", "**", "*.py"),
                             recursive=True))
    assert len(files) >= 22
    for f in files:
        exp = get_exp(f)
        # some exps decorate exp_name (e.g. the tune recipe appends a
        # suffix) — require it to at least contain the file stem's root
        assert os.path.basename(f)[:-3] in exp.exp_name
    custom_nano = get_exp(
        os.path.join(REPO, "exps", "example", "custom", "nano.py"))
    assert custom_nano.num_classes == 71
    assert custom_nano.model_name == "yolox-dw"
    assert custom_nano.enable_mixup is False
    custom_s = get_exp(
        os.path.join(REPO, "exps", "example", "custom", "yolox_s.py"))
    assert custom_s.num_classes == 71
    assert (custom_s.depth, custom_s.width) == (0.33, 0.50)
    assert custom_s.max_epoch == 300
    # the 2-D-mesh exp: every multiscale bucket must pass the measured
    # spatial-sharding validity guard (Trainer._check_spatial_sizes)
    from types import SimpleNamespace

    from cocodet_tpu.core.trainer import Trainer

    sp_exp = get_exp(os.path.join(REPO, "exps", "p6",
                                  "yolox_m_p6_spatial.py"))
    assert sp_exp.spatial_devices == 2 and sp_exp.device_mosaic
    Trainer._check_spatial_sizes(SimpleNamespace(exp=sp_exp), 2)


def test_multiscale_buckets():
    exp = get_exp_by_name("yolox-m-p6")
    sizes = exp.multiscale_sizes()
    # P6 exp: (-3, 1) at step 64 around 768 (ref yolox_p6.py:36-38,203-207)
    assert sizes[0] == (768 - 3 * 64, 768 - 3 * 64)
    assert sizes[-1] == (768 + 64, 768 + 64)
    assert all(s[0] % 64 == 0 for s in sizes)
    import random
    assert exp.random_input_size(random.Random(0)) in sizes


def test_letterbox_golden():
    from cocodet_tpu.data.transforms import letterbox

    img = np.full((50, 100, 3), 200, np.uint8)
    out, r = letterbox(img, (64, 64), use_native=False)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    assert r == pytest.approx(0.64)
    # content lands top-left at 32 rows; pad is 114
    assert out[:31, :63].mean() > 190
    assert np.allclose(out[40:], 114.0)


def test_train_transform_contract():
    from cocodet_tpu.data.transforms import TrainTransform

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (120, 90, 3), np.uint8)
    targets = np.asarray([[10.0, 20.0, 60.0, 80.0, 5.0],
                          [0.0, 0.0, 1.0, 1.0, 2.0]], np.float32)
    # 2nd box is 1x1 px: scaled by r=0.53 it drops below the >1px filter
    import random as pyrandom
    t = TrainTransform(max_labels=7, flip_prob=0.0, hsv_prob=0.0)
    out_img, labels = t(img, targets, (64, 64))
    assert out_img.shape == (64, 64, 3)
    assert labels.shape == (7, 5)
    # first target kept (cxcywh scaled by r), tiny one filtered (<1px)
    r = 64 / 120
    np.testing.assert_allclose(labels[0], [5.0, 35 * r, 50 * r, 50 * r,
                                           60 * r], rtol=1e-5)
    assert np.all(labels[1:] == 0)


def test_mosaic_and_sampler():
    from synthetic import make_fake_coco
    import tempfile

    from cocodet_tpu.data import (COCODataset, DetectionLoader,
                                  InfiniteSampler, MosaicDetection,
                                  TrainTransform, YoloBatchSampler)

    with tempfile.TemporaryDirectory() as root:
        make_fake_coco(root, n_images=6)
        ds = COCODataset(data_dir=root, json_file="instances_train2017.json",
                         name="train2017", img_size=(64, 64))
        mosaic = MosaicDetection(
            ds, mosaic=True, img_size=(64, 64),
            preproc=TrainTransform(max_labels=20),
            enable_mixup=True, mosaic_prob=1.0, mixup_prob=1.0)
        img, labels, _, _ = mosaic[0]
        assert img.shape == (64, 64, 3)
        assert labels.shape == (20, 5)

        sampler = InfiniteSampler(len(ds), seed=0, rank=1, world_size=2)
        it = iter(sampler)
        idxs = [next(it) for _ in range(10)]
        assert all(0 <= i < 6 for i in idxs)
        # rank-strided: rank 0 and rank 1 partition the stream
        it0 = iter(InfiniteSampler(len(ds), seed=0, rank=0, world_size=2))
        idxs0 = [next(it0) for _ in range(10)]
        full = iter(InfiniteSampler(len(ds), seed=0))
        interleaved = [next(full) for _ in range(20)]
        assert interleaved[0::2] == idxs0
        assert interleaved[1::2] == idxs

        loader = DetectionLoader(
            mosaic, YoloBatchSampler(InfiniteSampler(len(ds), seed=0), 2),
            num_workers=1)
        imgs, labels, infos, ids = next(iter(loader))
        assert imgs.shape == (2, 64, 64, 3)
        assert labels.shape == (2, 20, 5)

        # close_mosaic flips the wrapper off (ref dataloading close_mosaic)
        loader.close_mosaic()
        assert not mosaic.enable_mosaic


def test_image_folder_bucketing(tmp_path):
    import cv2

    from cocodet_tpu.data.folder import FolderLoader, ImageFolderDataset

    for i, (h, w) in enumerate([(100, 50), (50, 100), (80, 80)]):
        cv2.imwrite(str(tmp_path / f"img{i}.jpg"),
                    np.full((h, w, 3), 100, np.uint8))
    ds = ImageFolderDataset(str(tmp_path), img_size=64)
    # sorted by aspect h/w ascending: (50,100)=0.5, (80,80)=1, (100,50)=2
    aspects = [h / w for _, h, w in ds.files]
    assert aspects == sorted(aspects)

    loader = FolderLoader(ds, batch_size=2)
    batches = list(loader)
    assert all(img.shape[0] == 2 for img, _ in batches)  # padded batch dim
    for imgs, infos in batches:
        assert imgs.shape[1] % 64 == 0 and imgs.shape[2] % 64 == 0


def test_process_loader_matches_thread_loader(tmp_path):
    """mode="process" (fork workers) must produce the identical batch stream
    as mode="thread": per-item seeded RNGs make the augmentation stream
    independent of the executor."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_fake_coco

    import numpy as np

    from cocodet_tpu.data import (DetectionLoader, InfiniteSampler,
                                  MosaicDetection, TrainTransform,
                                  YoloBatchSampler)
    from cocodet_tpu.data.coco import COCODataset

    root = make_fake_coco(str(tmp_path / "coco"), n_images=8)

    def grab(mode, n=3):
        ds = COCODataset(data_dir=root, json_file="instances_train2017.json",
                         name="train2017", img_size=(64, 64), preproc=None)
        mosaic = MosaicDetection(
            ds, mosaic=True, img_size=(64, 64),
            preproc=TrainTransform(max_labels=10),
            mosaic_prob=1.0, enable_mixup=True, mixup_prob=1.0)
        sampler = InfiniteSampler(len(ds), seed=0)
        bs = YoloBatchSampler(sampler, 4, mosaic=True)
        loader = DetectionLoader(mosaic, bs, num_workers=2, seed=0,
                                 mode=mode)
        it = iter(loader)
        out = []
        for _ in range(n):
            imgs, labels, _, _ = next(it)
            out.append((np.asarray(imgs).sum(), np.asarray(labels).sum()))
        it.close()
        return out

    assert grab("thread") == grab("process")


def test_exposure_normalize():
    """Adaptive lowlight rescue (data/folder.py): identity on well-exposed
    and flat images, inverse-gain stretch on globally crushed ones
    (the synthetic lowlight variant's gain is 0.25-0.5,
    data/synthetic.py VARIANTS)."""
    import numpy as np

    from cocodet_tpu.data.folder import exposure_normalize

    rs = np.random.RandomState(0)
    normal = (rs.rand(48, 48, 3) * 255).astype(np.uint8)
    assert np.array_equal(exposure_normalize(normal), normal)

    flat = np.full((8, 8, 3), 40, np.uint8)
    assert np.array_equal(exposure_normalize(flat), flat)

    for gain in (0.25, 0.4):
        # inside the certain-crush region: full inverse-gain stretch
        dark = (normal * gain).astype(np.uint8)
        fixed = exposure_normalize(dark).astype(np.float32)
        # restored to roughly the original exposure (stretch hits [16,240])
        assert abs(fixed.mean() - float(normal.mean())) < 20.0
        # monotonic (order-preserving) transform
        a, b = dark[0, 0, 0], dark[1, 1, 1]
        fa, fb = fixed[0, 0, 0], fixed[1, 1, 1]
        if a < b:
            assert fa <= fb

    # borderline band (gain 0.5 of a bright image: p98 ~125): partial,
    # ramped correction — strictly brighter, but not the full stretch
    dark = (normal * 0.5).astype(np.uint8)
    fixed = exposure_normalize(dark).astype(np.float32)
    gap = float(normal.mean()) - float(dark.mean())
    closed = float(fixed.mean()) - float(dark.mean())
    assert 0.1 * gap < closed < 0.9 * gap
