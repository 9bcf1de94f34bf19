"""On-device (XLA) augmentation vs the host numpy/cv2 pipeline.

The same seeded python Random drives both paths per image (device_aug
draw_randoms replays the host TrainTransform call order), so outputs must
agree: exactly for geometry/labels, and within uint8 interpolation
tolerance for resampled pixels (cv2 runs fixed-point INTER_LINEAR and
integer HSV; the device runs float)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from cocodet_tpu.data.device_aug import (DeviceTrainAug, draw_randoms,
                                         bgr_to_hsv, hsv_to_bgr,
                                         letterbox_resize_one, mixup_batch,
                                         train_aug_batch)
from cocodet_tpu.data.transforms import TrainTransform, letterbox


def _rand_img(rs, h, w):
    # piecewise-smooth test image: random low-res field upsampled, so
    # interpolation differences stay in the rounding regime (a pure-noise
    # image makes any resampler comparison meaningless)
    import cv2

    small = rs.randint(0, 255, (max(h // 8, 2), max(w // 8, 2), 3))
    return cv2.resize(small.astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_LINEAR)


def _boxes(rs, n, h, w):
    t = np.zeros((n, 5), np.float32)
    x1 = rs.uniform(0, w * 0.6, n)
    y1 = rs.uniform(0, h * 0.6, n)
    t[:, 0], t[:, 1] = x1, y1
    t[:, 2] = x1 + rs.uniform(8, w * 0.35, n)
    t[:, 3] = y1 + rs.uniform(8, h * 0.35, n)
    t[:, 4] = rs.randint(0, 80, n)
    return t


def test_letterbox_parity():
    rs = np.random.RandomState(0)
    for h, w in [(100, 160), (240, 128), (64, 64), (200, 50)]:
        img = _rand_img(rs, h, w)
        host, r_host = letterbox(img, (128, 128), use_native=False)
        buf = np.zeros((256, 256, 3), np.uint8)
        buf[:h, :w] = img
        dev, r_dev = letterbox_resize_one(
            jnp.asarray(buf), jnp.asarray([h, w], jnp.int32), (128, 128))
        dev = np.asarray(dev)
        assert float(r_dev) == pytest.approx(r_host, rel=1e-6)
        # pad region must be exactly 114
        nh, nw = int(h * r_host), int(w * r_host)
        assert (dev[nh:] == 114.0).all() and (dev[:, nw:] == 114.0).all()
        diff = np.abs(dev - host)
        assert diff.max() <= 2.0, (h, w, diff.max())
        assert diff.mean() < 0.5


def test_hsv_roundtrip_and_cv2_parity():
    import cv2

    rs = np.random.RandomState(1)
    img = _rand_img(rs, 64, 64)
    # pure roundtrip is lossless in float
    h, s, v = bgr_to_hsv(jnp.asarray(img, jnp.float32))
    back = np.asarray(hsv_to_bgr(h, s, v))
    assert np.abs(back - img).max() < 1e-3
    # against cv2's uint8 HSV
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    got = np.stack([np.asarray(h), np.asarray(s), np.asarray(v)], -1)
    d = np.abs(got.astype(np.float32) - ref.astype(np.float32))
    d[..., 0] = np.minimum(d[..., 0], 180 - d[..., 0])  # hue wraps
    assert np.percentile(d, 99) <= 2.0
    assert d[..., 1:].max() <= 2.0


def _run_both(img, targets, input_dim, seed, flip_prob=0.5, hsv_prob=1.0,
              max_labels=50):
    host_t = TrainTransform(max_labels=max_labels, flip_prob=flip_prob,
                            hsv_prob=hsv_prob)
    h_img, h_lab = host_t(img.copy(), targets.copy(), input_dim,
                          rng=random.Random(seed))

    aug = DeviceTrainAug(input_dim, (320, 320), max_labels=max_labels,
                         flip_prob=flip_prob, hsv_prob=hsv_prob)
    d_imgs, d_labs = aug([(img, targets)], random.Random(seed))
    return h_img, h_lab, np.asarray(d_imgs[0]), np.asarray(d_labs[0])


def test_train_aug_parity_labels_exact():
    rs = np.random.RandomState(2)
    for seed in range(6):
        h, w = int(rs.randint(80, 300)), int(rs.randint(80, 300))
        img = _rand_img(rs, h, w)
        targets = _boxes(rs, int(rs.randint(1, 8)), h, w)
        h_img, h_lab, d_img, d_lab = _run_both(img, targets, (160, 160),
                                               seed)
        np.testing.assert_allclose(d_lab, h_lab, atol=1e-3, rtol=1e-5)
        # images: same geometry; pixel tolerance covers cv2 int HSV +
        # fixed-point resize vs float
        assert np.abs(d_img - h_img).mean() < 2.0
        assert np.percentile(np.abs(d_img - h_img), 95) <= 4.0


def test_train_aug_parity_gated_hsv():
    """hsv_prob < 1: the host consumes the 6 gain draws ONLY when the
    gate passes, so the flip draw position shifts — draw_randoms must
    replay the conditional order or flip decisions desync (regression
    test for the round-3 review finding)."""
    rs = np.random.RandomState(5)
    for seed in range(10):
        h, w = int(rs.randint(80, 260)), int(rs.randint(80, 260))
        img = _rand_img(rs, h, w)
        targets = _boxes(rs, int(rs.randint(1, 6)), h, w)
        h_img, h_lab, d_img, d_lab = _run_both(
            img, targets, (160, 160), seed, flip_prob=0.5, hsv_prob=0.4)
        np.testing.assert_allclose(d_lab, h_lab, atol=1e-3, rtol=1e-5)
        assert np.abs(d_img - h_img).mean() < 2.0


def test_train_aug_no_boxes_and_fallback():
    rs = np.random.RandomState(3)
    img = _rand_img(rs, 120, 90)
    # no boxes: host returns clean letterbox + zero labels
    empty = np.zeros((0, 5), np.float32)
    h_img, h_lab, d_img, d_lab = _run_both(img, empty, (96, 96), seed=7)
    assert (h_lab == 0).all() and (d_lab == 0).all()
    assert np.abs(d_img - h_img).max() <= 2.0

    # degenerate: every box shrinks below the 1px floor -> clean fallback
    tiny = np.array([[10.0, 10.0, 11.0, 11.0, 3.0]], np.float32)
    h_img, h_lab, d_img, d_lab = _run_both(img, tiny, (96, 96), seed=8)
    np.testing.assert_allclose(d_lab, h_lab, atol=1e-3)
    assert h_lab[0, 0] == 3.0  # fallback keeps the original box
    assert np.abs(d_img - h_img).max() <= 2.0


def test_train_aug_batch_one_program():
    """Different true sizes run through ONE fixed-shape jitted program."""
    rs = np.random.RandomState(4)
    items = []
    for _ in range(4):
        h, w = int(rs.randint(60, 320)), int(rs.randint(60, 320))
        img = _rand_img(rs, h, w)
        items.append((img, _boxes(rs, 3, h, w)))
    aug = DeviceTrainAug((128, 128), (320, 320), max_labels=20)
    imgs, labels = aug(items, random.Random(0))
    assert imgs.shape == (4, 128, 128, 3)
    assert labels.shape == (4, 20, 5)
    before = train_aug_batch._cache_size()
    # new true sizes, same batch/static config: no recompile
    items2 = []
    for _ in range(4):
        h, w = int(rs.randint(40, 300)), int(rs.randint(40, 300))
        im = _rand_img(rs, h, w)
        items2.append((im, _boxes(rs, 2, h, w)))
    imgs2, _ = aug(items2, random.Random(1))
    assert imgs2.shape == (4, 128, 128, 3)
    assert train_aug_batch._cache_size() == before


def test_trainer_device_aug_epoch(tmp_path):
    """End-to-end: Trainer with exp.device_aug=True — the loader ships raw
    uint8 buffers and the jitted TrainTransform runs in-graph."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_fake_coco

    from test_runtimes import Args, TinyExp
    from cocodet_tpu.core.trainer import Trainer

    root = make_fake_coco(str(tmp_path / "coco"), n_images=8)
    exp = TinyExp(root)
    exp.output_dir = str(tmp_path)
    exp.device_aug = True
    exp.mosaic_prob = 0.5  # exercise mosaic-composed AND raw items
    t = Trainer(exp, Args())
    t.train()
    assert int(t.state.step) == t.iters_per_epoch
    assert np.isfinite(float(t.meter["loss"].latest))


def test_mixup_batch():
    a_img = jnp.full((2, 8, 8, 3), 100.0)
    b_img = jnp.full((2, 8, 8, 3), 50.0)
    a_lab = np.zeros((2, 4, 5), np.float32)
    b_lab = np.zeros((2, 4, 5), np.float32)
    a_lab[0, 0] = [1, 10, 10, 5, 5]
    b_lab[0, 0] = [2, 20, 20, 6, 6]
    b_lab[0, 1] = [3, 30, 30, 7, 7]
    imgs, labs = mixup_batch(a_img, jnp.asarray(a_lab),
                             b_img, jnp.asarray(b_lab))
    assert float(imgs[0, 0, 0, 0]) == 75.0
    got = np.asarray(labs[0])
    assert got[0].tolist() == [1, 10, 10, 5, 5]
    assert got[1].tolist() == [2, 20, 20, 6, 6]
    assert got[2].tolist() == [3, 30, 30, 7, 7]
    assert (got[3] == 0).all()
    assert (np.asarray(labs[1]) == 0).all()
