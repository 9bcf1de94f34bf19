"""Unit tests for pure ops: boxes, decode, NMS (vs sequential oracle),
postprocess, losses/SimOTA sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodet_tpu.ops import (
    PostprocessConfig, batched_nms, cxcywh_to_xyxy, decode_center_format,
    decode_corner_scores, iou_loss, level_grid, nms_single, pairwise_iou,
    postprocess, simota_assign, xyxy_to_cxcywh, yolox_losses,
)


# ---------------- boxes ----------------

def test_box_roundtrip():
    b = jnp.array([[10.0, 20.0, 30.0, 60.0]])  # xyxy
    assert np.allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(b)), b)


def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(pairwise_iou(a, b))
    assert np.allclose(iou, [[1.0, 25.0 / 175.0, 0.0]])


def test_iou_loss_golden():
    p = jnp.array([[5.0, 5.0, 10.0, 10.0]])
    t = jnp.array([[5.0, 5.0, 10.0, 10.0]])
    assert np.allclose(iou_loss(p, t, "iou"), 0.0, atol=1e-6)
    assert np.allclose(iou_loss(p, t, "giou"), 0.0, atol=1e-6)
    # disjoint boxes: iou loss -> 1, giou loss > 1
    t2 = jnp.array([[50.0, 50.0, 10.0, 10.0]])
    assert np.allclose(iou_loss(p, t2, "iou"), 1.0, atol=1e-6)
    assert float(iou_loss(p, t2, "giou")[0]) > 1.0


# ---------------- decode ----------------

def test_decode_center_format():
    grids = level_grid(2, 2)
    strides = jnp.full((4,), 8.0)
    preds = jnp.zeros((1, 4, 6))  # 4 anchors, 1 class
    out = np.asarray(decode_center_format(preds, grids, strides))
    # xy = (0 + grid)*8, wh = exp(0)*8 = 8
    assert np.allclose(out[0, :, 0], [0, 8, 0, 8])
    assert np.allclose(out[0, :, 1], [0, 0, 8, 8])
    assert np.allclose(out[0, :, 2:4], 8.0)


def test_decode_corner_matches_center():
    grids = level_grid(4, 4)
    strides = jnp.full((16,), 16.0)
    preds = jnp.asarray(np.random.RandomState(0).randn(2, 16, 85) * 0.1)
    boxes, obj, cls = decode_corner_scores(preds, grids, strides)
    center = decode_center_format(preds, grids, strides)
    expect_x1 = center[..., 0] - center[..., 2] / 2
    assert np.allclose(boxes[..., 0], expect_x1, atol=1e-5)
    assert np.all(np.asarray(obj) >= 0) and np.all(np.asarray(obj) <= 1)
    # cls is already obj-multiplied
    assert np.all(np.asarray(cls) <= np.asarray(obj) + 1e-6)


# ---------------- NMS ----------------

def reference_greedy_nms(boxes, scores, thr):
    """Sequential greedy NMS oracle (numpy)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w, h = max(xx2 - xx1, 0), max(yy2 - yy1, 0)
            inter = w * h
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-12) > thr:
                suppressed[j] = True
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_sequential_oracle(seed):
    rs = np.random.RandomState(seed)
    n = 120
    centers = rs.rand(n, 2) * 100
    wh = rs.rand(n, 2) * 30 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1)
    scores = rs.rand(n)

    order = np.argsort(-scores, kind="stable")
    boxes_s = boxes[order].astype(np.float32)
    scores_s = scores[order].astype(np.float32)

    expect = reference_greedy_nms(boxes_s, scores_s, 0.5)

    res = nms_single(
        jnp.asarray(boxes_s), jnp.asarray(scores_s),
        jnp.zeros(n, jnp.int32), jnp.asarray(scores_s),
        jnp.ones(n, bool), iou_threshold=0.5, max_det=50,
        class_agnostic=True)
    got = [int(i) for i, v in zip(range(50), np.asarray(res.valid)) if v]
    got_boxes = np.asarray(res.boxes)[: len(got)]
    exp_boxes = boxes_s[expect][:50]
    assert len(got) == min(len(expect), 50)
    assert np.allclose(got_boxes[: len(exp_boxes)], exp_boxes, atol=1e-5)


def test_nms_class_aware():
    # identical overlapping boxes in different classes both survive
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    classes = jnp.asarray([0, 1], jnp.int32)
    res = nms_single(boxes, scores, classes, scores, jnp.ones(2, bool),
                     iou_threshold=0.5, max_det=10)
    assert int(np.sum(np.asarray(res.valid))) == 2
    res_ag = nms_single(boxes, scores, classes, scores, jnp.ones(2, bool),
                        iou_threshold=0.5, max_det=10, class_agnostic=True)
    assert int(np.sum(np.asarray(res_ag.valid))) == 1


def test_batched_nms_shapes():
    b, k = 3, 64
    rs = np.random.RandomState(0)
    boxes = jnp.asarray(rs.rand(b, k, 4) * 50, jnp.float32)
    scores = -jnp.sort(-jnp.asarray(rs.rand(b, k), jnp.float32), axis=1)
    classes = jnp.zeros((b, k), jnp.int32)
    valid = jnp.ones((b, k), bool)
    res = batched_nms(boxes, scores, classes, scores, valid, max_det=20)
    assert res.boxes.shape == (b, 20, 4)
    assert res.valid.shape == (b, 20)


# ---------------- postprocess ----------------

def _fake_head_outputs(rs, b=2, hw=((8, 8), (4, 4)), c=5):
    outs = []
    for h, w in hw:
        outs.append({
            "reg": jnp.asarray(rs.randn(b, h, w, 4) * 0.2, jnp.float32),
            "obj": jnp.asarray(rs.randn(b, h, w, 1), jnp.float32),
            "cls": jnp.asarray(rs.randn(b, h, w, c), jnp.float32),
        })
    return outs


def test_postprocess_end_to_end():
    rs = np.random.RandomState(0)
    outs = _fake_head_outputs(rs)
    cfg = PostprocessConfig(num_classes=5, conf_threshold=0.01,
                            pre_nms_topk=64, max_det=10)
    res = postprocess(outs, (8, 16), cfg)
    assert res.boxes.shape == (2, 10, 4)
    # valid detections have score >= threshold
    v = np.asarray(res.valid)
    s = np.asarray(res.scores)
    assert np.all(s[v] >= cfg.conf_threshold)


def test_postprocess_rmmop_and_multiclass():
    rs = np.random.RandomState(1)
    outs = _fake_head_outputs(rs)
    for cfg in [
        PostprocessConfig(num_classes=5, multi_class=True, pre_nms_topk=64,
                          max_det=10),
        PostprocessConfig(num_classes=5, rmmop=(1.2, 0.5), pre_nms_topk=64,
                          max_det=10),
    ]:
        res = postprocess(outs, (8, 16), cfg)
        assert res.boxes.shape == (2, 10, 4)


# ---------------- losses / SimOTA ----------------

def test_simota_assigns_center_anchor():
    """A single GT box centered on one anchor must produce >=1 positive
    anchor at that location."""
    a_grid = 8
    h = w = a_grid
    stride = 8.0
    preds = {"reg": jnp.zeros((1, h, w, 4)),
             "obj": jnp.zeros((1, h, w, 1)),
             "cls": jnp.zeros((1, h, w, 3))}
    # gt centered at pixel (36, 36) ~ anchor (4, 4), size 16x16
    labels = jnp.asarray([[[1.0, 36.0, 36.0, 16.0, 16.0]]
                          + [[0.0] * 5] * 9])[:, :, :]
    losses, tgt = yolox_losses([preds], labels, strides=(8,), num_classes=3)
    fg = np.asarray(tgt.fg_mask)[0].reshape(h, w)
    assert fg.sum() >= 1
    assert fg[4, 4] or fg[3:6, 3:6].any()
    assert float(tgt.num_gts) == 1.0
    assert np.isfinite(float(losses.total))


def test_simota_bf16_agreement():
    """simota_dtype=bf16 (the HBM-traffic lever, ops/simota.py) must make
    near-identical assignments to f32 on a realistic random scene: it only
    coarsens cost/IoU VALUES, never the selection logic, so disagreement
    is limited to genuine near-ties.  Targets stay f32 either way."""
    rng = np.random.RandomState(7)
    b, hw, c = 2, 16, 8
    preds = {"reg": jnp.asarray(rng.randn(b, hw, hw, 4), jnp.float32),
             "obj": jnp.asarray(rng.randn(b, hw, hw, 1), jnp.float32),
             "cls": jnp.asarray(rng.randn(b, hw, hw, c), jnp.float32)}
    labels = np.zeros((b, 12, 5), np.float32)
    for i in range(b):
        n = rng.randint(4, 12)
        labels[i, :n, 0] = rng.randint(0, c, n)
        labels[i, :n, 1:3] = rng.uniform(16, hw * 8 - 16, (n, 2))
        labels[i, :n, 3:5] = rng.uniform(8, 48, (n, 2))
    labels = jnp.asarray(labels)

    out = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        losses, tgt = yolox_losses([preds], labels, strides=(8,),
                                   num_classes=c, simota_dtype=dt)
        out[name] = (losses, tgt)
        assert tgt.cls_target.dtype == jnp.float32
        assert tgt.reg_target.dtype == jnp.float32
        assert np.isfinite(float(losses.total))

    fg32 = np.asarray(out["f32"][1].fg_mask)
    fgbf = np.asarray(out["bf16"][1].fg_mask)
    agree = (fg32 == fgbf).mean()
    assert agree >= 0.995, f"fg agreement {agree}"
    n32, nbf = float(out["f32"][1].num_fg), float(out["bf16"][1].num_fg)
    assert abs(n32 - nbf) <= max(2.0, 0.05 * n32)
    l32, lbf = float(out["f32"][0].total), float(out["bf16"][0].total)
    assert abs(l32 - lbf) / l32 < 0.05


def test_losses_no_gt():
    preds = {"reg": jnp.zeros((2, 4, 4, 4)),
             "obj": jnp.zeros((2, 4, 4, 1)),
             "cls": jnp.zeros((2, 4, 4, 3))}
    labels = jnp.zeros((2, 5, 5))
    losses, tgt = yolox_losses([preds], labels, strides=(8,), num_classes=3)
    assert float(tgt.num_fg) == 0.0
    # only obj loss active; cls/iou exactly zero
    assert float(losses.cls) == 0.0
    assert float(losses.iou) == 0.0
    assert float(losses.obj) > 0.0


def test_losses_l1_branch():
    preds = {"reg": jnp.zeros((1, 4, 4, 4)),
             "obj": jnp.zeros((1, 4, 4, 1)),
             "cls": jnp.zeros((1, 4, 4, 3))}
    labels = jnp.asarray([[[0.0, 16.0, 16.0, 10.0, 10.0]] + [[0.0] * 5] * 4])
    l_off, _ = yolox_losses([preds], labels, strides=(8,), num_classes=3,
                            use_l1=False)
    l_on, _ = yolox_losses([preds], labels, strides=(8,), num_classes=3,
                           use_l1=True)
    assert float(l_off.l1) == 0.0
    assert float(l_on.l1) > 0.0
    assert float(l_on.total) > float(l_off.total)


def test_losses_grad_flows():
    def loss_fn(reg):
        preds = {"reg": reg, "obj": jnp.zeros((1, 4, 4, 1)),
                 "cls": jnp.zeros((1, 4, 4, 3))}
        labels = jnp.asarray(
            [[[0.0, 16.0, 16.0, 10.0, 10.0]] + [[0.0] * 5] * 4])
        losses, _ = yolox_losses([preds], labels, strides=(8,), num_classes=3)
        return losses.total

    g = jax.grad(loss_fn)(jnp.zeros((1, 4, 4, 4)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_soft_nms_decays_overlaps():
    # two heavy overlaps, one distant: soft-NMS keeps all but decays scores
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    classes = jnp.zeros(3, jnp.int32)
    res = nms_single(boxes, scores, classes, scores, jnp.ones(3, bool),
                     iou_threshold=0.5, max_det=5, class_agnostic=True,
                     soft=True)
    v = np.asarray(res.valid)
    s = np.asarray(res.scores)[v]
    assert v.sum() == 3
    # the overlapping second box decayed; the distant one did not
    assert s[0] == pytest.approx(0.9, abs=1e-5)
    decayed = sorted(s)[:2]
    assert min(decayed) < 0.8
    assert np.isclose(s, 0.7).any()


def test_topk_small_matches_lax_topk():
    """_topk_small (the unrolled SimOTA top-k) must match jax.lax.top_k
    exactly, including tie order (lowest index first)."""
    import jax.numpy as jnp

    from cocodet_tpu.ops.simota import _topk_small

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(7, 50).astype(np.float32))
    # inject ties
    x = x.at[2, 10].set(x[2, 3])
    x = x.at[5, :4].set(0.5)
    for k in (1, 5, 10):
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = _topk_small(x, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # -inf rows (fully masked) stay well-defined
    xm = jnp.full((3, 8), -jnp.inf)
    v, i = _topk_small(xm, 4)
    assert np.isneginf(np.asarray(v)).all()
