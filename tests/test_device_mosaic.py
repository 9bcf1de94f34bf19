"""On-device mosaic+affine+mixup vs the host numpy/cv2 pipeline.

One seeded python Random drives both paths (DeviceMosaicDataset.fetch
replays MosaicDetection.fetch's exact rng call order), so label math must
agree to float tolerance and images within resampling tolerance.  The
affine warp runs as a Catmull–Smith two-pass resample on device: for
axis-aligned draws (degrees = shear = 0) it equals cv2's separable
bilinear; with rotation the footprint is a parallelogram, so the image
comparison there is statistical while boxes stay exact."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from cocodet_tpu.data.device_aug import train_aug_batch
from cocodet_tpu.data.device_mosaic import (DeviceMosaicDataset,
                                            affine_warp, affine_boxes,
                                            get_affine_params,
                                            make_mosaic_collate,
                                            mosaic_mixup_batch)
from cocodet_tpu.data.mosaic import MosaicDetection
from cocodet_tpu.data.transforms import (TrainTransform, get_affine_matrix,
                                         random_affine)


def _rand_img(rs, h, w):
    import cv2

    small = rs.randint(0, 255, (max(h // 8, 2), max(w // 8, 2), 3))
    return cv2.resize(small.astype(np.uint8), (w, h),
                      interpolation=cv2.INTER_LINEAR)


def _boxes(rs, n, h, w):
    t = np.zeros((n, 5), np.float32)
    x1 = rs.uniform(0, w * 0.5, n)
    y1 = rs.uniform(0, h * 0.5, n)
    t[:, 0], t[:, 1] = x1, y1
    t[:, 2] = np.minimum(x1 + rs.uniform(6, w * 0.4, n), w - 1)
    t[:, 3] = np.minimum(y1 + rs.uniform(6, h * 0.4, n), h - 1)
    t[:, 4] = rs.randint(0, 13, n)
    return t


class FakeDataset:
    """Minimal pull_item/annotations dataset (COCODataset surface used by
    both mosaic paths; images pre-fit to img_size like coco.py:128-143)."""

    def __init__(self, rs, n=10, img_size=(64, 64), empty_every=0):
        self.img_size = img_size
        self._imgs, self.annotations = [], []
        for i in range(n):
            h = int(rs.randint(img_size[0] // 2, img_size[0] + 1))
            w = int(rs.randint(img_size[1] // 2, img_size[1] + 1))
            img = _rand_img(rs, h, w)
            nb = 0 if (empty_every and i % empty_every == 0) \
                else int(rs.randint(1, 5))
            tg = _boxes(rs, nb, h, w) if nb else np.zeros((0, 5), np.float32)
            self._imgs.append(img)
            self.annotations.append((tg, (h, w), (h, w), f"{i}.jpg"))

    def __len__(self):
        return len(self._imgs)

    def pull_item(self, index):
        tg, info, _, _ = self.annotations[index]
        return self._imgs[index].copy(), tg.copy(), info, index


def _warp_pair(rs, m, size=96):
    import cv2

    img = _rand_img(rs, size, size)
    host = cv2.warpAffine(img, m.reshape(2, 3), dsize=(size // 2, size // 2),
                          borderValue=(114, 114, 114))
    dev = np.asarray(affine_warp(jnp.asarray(img, jnp.float32),
                                 jnp.asarray(m.reshape(6), jnp.float32),
                                 (size // 2, size // 2)))
    return host.astype(np.float32), dev


def test_affine_warp_axis_aligned_matches_cv2():
    rs = np.random.RandomState(0)
    for seed in range(4):
        rng = random.Random(seed)
        m = get_affine_params((48, 48), degrees=0.0, translate=0.1,
                              scales=(0.6, 1.4), shear=0.0, rng=rng)
        host, dev = _warp_pair(rs, m)
        d = np.abs(dev - host)
        assert d.mean() < 1.0, (seed, d.mean())
        assert np.percentile(d, 99) <= 4.0, (seed, np.percentile(d, 99))


def test_affine_warp_rotation_close_to_cv2():
    rs = np.random.RandomState(1)
    for seed in range(4):
        rng = random.Random(seed)
        m = get_affine_params((48, 48), degrees=10.0, translate=0.1,
                              scales=(0.6, 1.4), shear=2.0, rng=rng)
        host, dev = _warp_pair(rs, m)
        d = np.abs(dev - host)
        # two-pass vs direct bilinear: sub-pixel parallelogram smoothing
        assert d.mean() < 4.0, (seed, d.mean())
        assert np.percentile(d, 90) <= 12.0, (seed, np.percentile(d, 90))


def test_affine_params_match_host_matrix():
    """get_affine_params re-derives cv2.getRotationMatrix2D — must equal
    transforms.get_affine_matrix for the same rng stream."""
    for seed in range(8):
        m_host, _ = get_affine_matrix((64, 48), degrees=10.0, translate=0.1,
                                      scales=(0.5, 1.5), shear=2.0,
                                      rng=random.Random(seed))
        m_dev = get_affine_params((64, 48), degrees=10.0, translate=0.1,
                                  scales=(0.5, 1.5), shear=2.0,
                                  rng=random.Random(seed))
        np.testing.assert_allclose(m_dev.reshape(2, 3), m_host, atol=1e-12)


def test_affine_boxes_match_host():
    rs = np.random.RandomState(2)
    tg = _boxes(rs, 6, 128, 128)
    m = get_affine_params((64, 64), 10.0, 0.1, (0.5, 1.5), 2.0,
                          random.Random(3))
    from cocodet_tpu.data.transforms import apply_affine_to_bboxes

    host = apply_affine_to_bboxes(tg.copy(), (64, 64), m.reshape(2, 3))
    dev = np.asarray(affine_boxes(jnp.asarray(tg[:, :4]),
                                  jnp.asarray(m, jnp.float32), (64, 64)))
    np.testing.assert_allclose(dev, host[:, :4], atol=5e-3)


def _run_both_paths(seed, ds_rs_seed=5, n_items=3, input_dim=(64, 64),
                    degrees=10.0, shear=2.0, mosaic_prob=1.0,
                    enable_mixup=True, max_labels=30):
    rs = np.random.RandomState(ds_rs_seed)
    dataset = FakeDataset(rs, n=10, img_size=input_dim)
    return _run_both_paths_with(dataset, seed, n_items=n_items,
                                input_dim=input_dim, degrees=degrees,
                                shear=shear, mosaic_prob=mosaic_prob,
                                enable_mixup=enable_mixup,
                                max_labels=max_labels)


def _run_both_paths_with(dataset, seed, n_items=3, input_dim=(64, 64),
                         degrees=10.0, shear=2.0, mosaic_prob=1.0,
                         enable_mixup=True, max_labels=30):
    kw = dict(degrees=degrees, translate=0.1, mosaic_scale=(0.8, 1.2),
              mixup_scale=(0.7, 1.3), shear=shear,
              enable_mixup=enable_mixup, mosaic_prob=mosaic_prob,
              mixup_prob=1.0)

    host_m = MosaicDetection(
        dataset, mosaic=True, img_size=input_dim,
        preproc=TrainTransform(max_labels=max_labels, flip_prob=0.5,
                               hsv_prob=1.0), **kw)
    dev_ds = DeviceMosaicDataset(dataset, img_size=input_dim, **kw)
    collate = make_mosaic_collate(input_dim, max_boxes=16)

    host_out, dev_items = [], []
    for i in range(n_items):
        h_img, h_lab, _, _ = host_m.fetch(i, rng=random.Random(seed + i))
        host_out.append((h_img, h_lab))
        dev_items.append(dev_ds.fetch(i, rng=random.Random(seed + i)))

    batch, _, _, _ = collate(dev_items)
    # the PRODUCTION composition (apply_device_preproc's mosaic branch) —
    # including the host-f64 nhw_final extents for passthrough items
    from cocodet_tpu.data.device_aug import mosaic_preproc_batch

    d_imgs, d_labs = mosaic_preproc_batch(
        batch, input_dim, max_labels=max_labels, flip_prob=0.5,
        hsv_prob=1.0)
    return host_out, np.asarray(d_imgs), np.asarray(d_labs)


def test_mosaic_end_to_end_axis_aligned():
    host, d_imgs, d_labs = _run_both_paths(seed=11, degrees=0.0, shear=0.0)
    for i, (h_img, h_lab) in enumerate(host):
        np.testing.assert_allclose(d_labs[i], h_lab, atol=0.05,
                                   err_msg=f"item {i}")
        d = np.abs(d_imgs[i] - h_img)
        assert d.mean() < 2.5, (i, d.mean())


def test_mosaic_end_to_end_rotation_labels():
    host, d_imgs, d_labs = _run_both_paths(seed=23)
    for i, (h_img, h_lab) in enumerate(host):
        np.testing.assert_allclose(d_labs[i], h_lab, atol=0.05,
                                   err_msg=f"item {i}")
        d = np.abs(d_imgs[i] - h_img)
        assert d.mean() < 6.0, (i, d.mean())


def test_passthrough_and_mixup_on_passthrough():
    """mosaic_prob=0: host pulls the raw item, may still mixup, then
    TrainTransform (mosaic.py:104-112)."""
    host, d_imgs, d_labs = _run_both_paths(seed=31, mosaic_prob=0.0)
    for i, (h_img, h_lab) in enumerate(host):
        np.testing.assert_allclose(d_labs[i], h_lab, atol=0.05,
                                   err_msg=f"item {i}")
        assert np.abs(d_imgs[i] - h_img).mean() < 2.5


def test_no_mixup_path():
    host, d_imgs, d_labs = _run_both_paths(seed=41, enable_mixup=False,
                                           degrees=0.0, shear=0.0)
    for i, (h_img, h_lab) in enumerate(host):
        np.testing.assert_allclose(d_labs[i], h_lab, atol=0.05)
        assert np.abs(d_imgs[i] - h_img).mean() < 2.5


def test_passthrough_parity_at_f32_divergent_sizes():
    """Regression: raw sizes where floor(f32(h*r)) != int(f64(h*r)) —
    ~6% of (h, w) pairs.  Passthrough items (mosaic gate failed) and the
    mixup partner's first letterbox must use HOST-f64 extents (fetch's
    nhw rows + apply_device_preproc's nhw_final), or the resized region
    is one pixel off vs TrainTransform and labels shift."""
    rs = np.random.RandomState(7)
    dataset = FakeDataset(rs, n=10, img_size=(64, 64))
    # force every item to a known-divergent size: (33, 47) -> f64 extents
    # (44, 64) but f32 floor gives (44, 63)
    for i in range(len(dataset)):
        h, w = 33, 47
        dataset._imgs[i] = _rand_img(rs, h, w)
        tg = _boxes(rs, 3, h, w)
        dataset.annotations[i] = (tg, (h, w), (h, w), f"{i}.jpg")

    host, d_imgs, d_labs = _run_both_paths_with(dataset, seed=51,
                                                mosaic_prob=0.0)
    for i, (h_img, h_lab) in enumerate(host):
        np.testing.assert_allclose(d_labs[i], h_lab, atol=0.05,
                                   err_msg=f"item {i}")
        assert np.abs(d_imgs[i] - h_img).mean() < 2.5, i


def test_trainer_device_mosaic_epoch(tmp_path):
    """End-to-end: Trainer with exp.device_mosaic=True runs a full tiny
    epoch through mosaic_mixup_batch + train_aug_batch in-graph."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_fake_coco

    from test_runtimes import Args, TinyExp

    data_dir = make_fake_coco("/tmp/cocodet_devmosaic_coco", n_images=8)
    exp = TinyExp(data_dir)
    exp.device_mosaic = True
    exp.mosaic_prob = 1.0
    exp.enable_mixup = True
    exp.output_dir = str(tmp_path)
    from cocodet_tpu.core.trainer import Trainer

    t = Trainer(exp, Args())
    t.train()
    assert np.isfinite(t.meter["loss"].latest)


def test_chunked_batch_matches_unchunked():
    """The lax.map chunking (with tail padding for batch sizes not
    divisible by the chunk) must be invisible in the outputs — regression
    test for the gcd-based chunking that silently disabled the memory
    bound for coprime batch sizes."""
    rs = np.random.RandomState(9)
    dataset = FakeDataset(rs, n=10, img_size=(64, 64))
    dev_ds = DeviceMosaicDataset(dataset, img_size=(64, 64), degrees=5.0,
                                 translate=0.1, mosaic_scale=(0.8, 1.2),
                                 mixup_scale=(0.7, 1.3), shear=1.0,
                                 enable_mixup=True, mosaic_prob=1.0,
                                 mixup_prob=1.0)
    collate = make_mosaic_collate((64, 64), max_boxes=16)
    items = [dev_ds.fetch(i, rng=random.Random(100 + i)) for i in range(6)]
    batch, _, _, _ = collate(items)
    args = (batch["mosaic_tiles"], batch["hw5"], batch["nhw5"],
            batch["boxes5"], batch["classes5"], batch["nvalid5"],
            batch["mrand"])
    ref = mosaic_mixup_batch(*args, out_size=(64, 64), chunk=6)
    out = mosaic_mixup_batch(*args, out_size=(64, 64), chunk=4)  # pad=2
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


@pytest.mark.slow
def test_trainer_device_mosaic_spatial_mesh(tmp_path):
    """The packaged 2-D-mesh operating point (exps/p6/yolox_m_p6_spatial):
    device-mosaic raw-buffer batches + a (4 data, 2 space) mesh through a
    real Trainer epoch.  Exercises the per-leaf sharding chooser on the
    mixed-rank mosaic dict (5-D tiles shard batch-only, 4-D images
    height-shard) at a spatial-guard-valid 256px size."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic import make_fake_coco

    from test_runtimes import Args, TinyExp

    data_dir = make_fake_coco("/tmp/cocodet_devmosaic_sp_coco", n_images=8,
                              size=192)
    exp = TinyExp(data_dir)
    exp.input_size = exp.test_size = (256, 256)
    exp.device_mosaic = True
    exp.mosaic_prob = 1.0
    exp.enable_mixup = True
    exp.spatial_devices = 2
    exp.no_aug_epochs = -1
    exp.output_dir = str(tmp_path)
    from cocodet_tpu.core.trainer import Trainer

    t = Trainer(exp, Args())
    t.train()
    assert t.mesh is not None and t.mesh.devices.shape == (4, 2)
    assert np.isfinite(t.meter["loss"].latest)
