"""Data-parallel submission harness: mesh-sharded batches must reproduce
the single-device detections exactly.

The harness's ``data_parallel`` config shards the batch dim over every
visible device (8 virtual CPU devices here, conftest.py) with replicated
params — the serving-side analog of the evaluators' mesh sharding.
Ref context: the reference serves single-GPU (choijhanyangackr/main.py);
scale-out here is a mesh property of the same jitted program.
"""

import importlib
import json
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "harness"))


def _cfg(data_dir, dp, sp=False):
    return {
        "model": {"type": "yolox-p6", "depth": 0.33, "width": 0.125},
        "ckpt": None,
        "img_size": 64,
        "half": False,
        "data_dir": data_dir,
        "dataloader": {"batch_size": 8},
        "postprocess": {"conf_threshold": 1e-5, "nms_threshold": 0.65,
                        "max_num_nms": 128, "max_num_det": 16},
        "input_aug": False,
        "data_parallel": dp,
        "spatial_partition": sp,
    }


def test_data_parallel_matches_single(tmp_path):
    from synthetic import make_fake_coco

    assert len(jax.devices()) == 8
    root = make_fake_coco(str(tmp_path / "coco"), n_images=10, size=96)
    hmain = importlib.import_module("main")

    out1 = str(tmp_path / "dets_single.json")
    out2 = str(tmp_path / "dets_dp.json")
    # 10 images / batch 8 -> one full batch + a ragged tail of 2 (covers
    # the dp pad path)
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False), out1)
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=True), out2)

    with open(out1) as f:
        a = json.load(f)
    with open(out2) as f:
        b = json.load(f)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        assert ra["category_id"] == rb["category_id"]
        np.testing.assert_allclose(ra["bbox"], rb["bbox"], atol=1e-2)


def test_spatial_partition_matches_single(tmp_path):
    """Height-sharded inference (XLA GSPMD conv halo exchanges) must
    reproduce single-device detections."""
    from synthetic import make_fake_coco

    root = make_fake_coco(str(tmp_path / "coco"), n_images=4, size=96)
    hmain = importlib.import_module("main")

    out1 = str(tmp_path / "dets_single.json")
    out2 = str(tmp_path / "dets_sp.json")
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False), out1)
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False, sp=True), out2)

    with open(out1) as f:
        a = json.load(f)
    with open(out2) as f:
        b = json.load(f)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        assert ra["category_id"] == rb["category_id"]
        np.testing.assert_allclose(ra["bbox"], rb["bbox"], atol=1e-2)


def test_data_parallel_batch_divisibility(tmp_path):
    from synthetic import make_fake_coco

    root = make_fake_coco(str(tmp_path / "coco"), n_images=2, size=96)
    hmain = importlib.import_module("main")
    cfg = _cfg(os.path.join(root, "val2017"), dp=True)
    cfg["dataloader"]["batch_size"] = 3  # 3 % 8 != 0
    with pytest.raises(ValueError, match="must be a multiple"):
        hmain.run(cfg, str(tmp_path / "x.json"))


def test_combined_dp_sp_matches_single(tmp_path):
    """2-D serving mesh (spatial_partition = int S combined with
    data_parallel): batch sharded over 4 rows AND image height over 2
    columns must reproduce single-device detections."""
    from synthetic import make_fake_coco

    root = make_fake_coco(str(tmp_path / "coco"), n_images=10, size=96)
    hmain = importlib.import_module("main")

    out1 = str(tmp_path / "dets_single.json")
    out2 = str(tmp_path / "dets_dpsp.json")
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False), out1)
    cfg = _cfg(os.path.join(root, "val2017"), dp=True, sp=2)
    hmain.run(cfg, out2)  # (4 data, 2 space) mesh; batch 8 % 4 rows == 0

    with open(out1) as f:
        a = json.load(f)
    with open(out2) as f:
        b = json.load(f)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        assert ra["category_id"] == rb["category_id"]
        np.testing.assert_allclose(ra["bbox"], rb["bbox"], atol=1e-2)

    # combining with a bare boolean is rejected (the 2-D split needs an
    # explicit integer)
    bad = _cfg(os.path.join(root, "val2017"), dp=True, sp=True)
    with pytest.raises(ValueError, match="integer"):
        hmain.run(bad, str(tmp_path / "x.json"))


def test_spatial_partition_int_subset(tmp_path):
    """spatial_partition as an integer (without data_parallel) shards
    image height over only S of the visible devices; S must divide the
    max stride (aspect-bucket heights are stride multiples)."""
    from synthetic import make_fake_coco

    root = make_fake_coco(str(tmp_path / "coco"), n_images=4, size=96)
    hmain = importlib.import_module("main")

    out1 = str(tmp_path / "dets_single.json")
    out2 = str(tmp_path / "dets_sp2.json")
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False), out1)
    hmain.run(_cfg(os.path.join(root, "val2017"), dp=False, sp=2), out2)

    with open(out1) as f:
        a = json.load(f)
    with open(out2) as f:
        b = json.load(f)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        np.testing.assert_allclose(ra["bbox"], rb["bbox"], atol=1e-2)

    # S=3 divides neither the device count (8) nor the stride (64)
    bad = _cfg(os.path.join(root, "val2017"), dp=False, sp=3)
    with pytest.raises(ValueError, match="spatial_partition=3"):
        hmain.run(bad, str(tmp_path / "x.json"))
