"""pre_nms_topk cap verification (VERDICT r1 item 5 / weak 5).

The reference keeps 5000 pre-NMS candidates (ref
choijhanyangackr/yolox_infer/postprocess_utils.py:59-60); this framework
defaults to 2048 for VMEM-friendly (K, K) suppression. This test builds the
dense adversarial case — thousands of above-threshold candidates with true
and noise scores interleaved — and measures the mAP delta between the two
caps on the full postprocess path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodet_tpu.evaluators.coco_metric import COCOMeanAP
from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

STRIDES = (8, 16, 32, 64)
SIZE = 640


def _logit(p):
    p = np.clip(p, 1e-7, 1 - 1e-7)
    return np.log(p / (1 - p))


def _dense_scene(seed=0, n_true=250):
    """Raw NHWC head maps with n_true planted boxes (scores 0.004..0.9,
    deliberately overlapping the noise band) and EVERY other cell emitting
    background noise at 0.0011..0.02 — ~8k above-threshold candidates, so
    the top-K truncation actually bites."""
    rs = np.random.RandomState(seed)
    outputs = []
    gt = []
    shapes = [(SIZE // s, SIZE // s) for s in STRIDES]
    # plant true boxes on level 0 only (stride 8)
    h0, w0 = shapes[0]
    cells = rs.choice(h0 * w0, size=n_true, replace=False)
    true_scores = rs.uniform(0.004, 0.9, n_true)
    for li, ((h, w), s) in enumerate(zip(shapes, STRIDES)):
        reg = rs.uniform(-0.2, 0.2, (1, h, w, 4)).astype(np.float32)
        reg[..., 2:4] = rs.uniform(-0.3, 0.3, (1, h, w, 2))  # ~1-cell boxes
        obj = _logit(rs.uniform(0.0011, 0.02, (1, h, w, 1))).astype(np.float32)
        cls = np.full((1, h, w, 80), _logit(0.999), np.float32)
        if li == 0:
            for ci, (cell, sc) in enumerate(zip(cells, true_scores)):
                cy, cx = divmod(int(cell), w0)
                obj[0, cy, cx, 0] = _logit(sc)
                # reconstruct the decoded box for GT
                x = (cx + reg[0, cy, cx, 0]) * s
                y = (cy + reg[0, cy, cx, 1]) * s
                hw = np.exp(reg[0, cy, cx, 2]) * s * 0.5
                hh = np.exp(reg[0, cy, cx, 3]) * s * 0.5
                gt.append({"id": ci, "image_id": 0, "category_id": 1,
                           "bbox": [x - hw, y - hh, 2 * hw, 2 * hh],
                           "area": 4 * hw * hh, "iscrowd": 0})
        outputs.append({"reg": jnp.asarray(reg), "obj": jnp.asarray(obj),
                        "cls": jnp.asarray(cls)})
    return outputs, gt


def _run(outputs, topk):
    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.65,
                            pre_nms_topk=topk, max_det=300,
                            use_pallas=False)
    res = jax.jit(lambda o: postprocess(o, STRIDES, cfg))(outputs)
    return jax.device_get(res)


def _map_of(res, gt):
    m = COCOMeanAP()
    m.add_gt_annotations(gt)
    dets = []
    for j in range(res.boxes.shape[1]):
        if not res.valid[0, j]:
            break
        x1, y1, x2, y2 = [float(v) for v in res.boxes[0, j]]
        dets.append({"image_id": 0, "category_id": 1,
                     "bbox": [x1, y1, x2 - x1, y2 - y1],
                     "score": float(res.scores[0, j])})
    m.add_detections(dets)
    return m.summarize()["AP"]


@pytest.mark.parametrize("topk", [2048, 1024])
def test_topk_vs_5000_dense_scene(topk):
    """2048 (default) and 1024 (the measured-fast operating point, +14%
    throughput on a v5e) are mAP-equivalent to the reference's 5000 even on
    a ~8k-candidate adversarial scene: the final cap is max_det=300, and
    NMS survivors always sit inside the top-K by score."""
    outputs, gt = _dense_scene()
    rk = _run(outputs, topk)
    r5000 = _run(outputs, 5000)

    # the truncation must actually be active for this to be a real check
    nk = int(rk.valid.sum())
    assert nk > 100, "scene not dense enough to exercise the cap"

    apk = _map_of(rk, gt)
    ap5000 = _map_of(r5000, gt)
    # documented equivalence claim (ops/postprocess.py:36-38)
    assert abs(apk - ap5000) < 2e-3, (apk, ap5000)

    # and the top-100 kept detections are identical box-for-box
    np.testing.assert_allclose(rk.boxes[0, :100], r5000.boxes[0, :100],
                               atol=1e-4)
    np.testing.assert_allclose(rk.scores[0, :100], r5000.scores[0, :100],
                               atol=1e-6)
