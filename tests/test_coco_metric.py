"""COCO mAP metric goldens (hand-computed protocol cases)."""

import numpy as np
import pytest

from cocodet_tpu.evaluators.coco_metric import COCOMeanAP, box_iou_xywh, match_image


def _gt(img, cat, bbox, crowd=0):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "area": bbox[2] * bbox[3], "iscrowd": crowd}


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "score": score}


def test_iou_crowd_denominator():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 20, 20]], float)
    iou = box_iou_xywh(d, g, np.array([0]))
    iof = box_iou_xywh(d, g, np.array([1]))
    assert np.allclose(iou, 100.0 / 400.0)
    assert np.allclose(iof, 1.0)  # crowd: denominator is det area


def test_perfect_detection_ap1():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (10, 10, 20, 20)),
                          _gt(1, 1, (50, 50, 10, 10))])
    m.add_detections([_dt(1, 1, (10, 10, 20, 20), 0.9),
                      _dt(1, 1, (50, 50, 10, 10), 0.8)])
    s = m.summarize()
    assert np.isclose(s["AP"], 1.0)
    assert np.isclose(s["AP50"], 1.0)
    assert np.isclose(s["AR100"], 1.0)


def test_miss_and_fp():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (10, 10, 20, 20)),
                          _gt(1, 1, (100, 100, 20, 20))])
    # one perfect hit + one far-away FP with LOWER score, one GT missed
    m.add_detections([_dt(1, 1, (10, 10, 20, 20), 0.9),
                      _dt(1, 1, (300, 300, 20, 20), 0.3)])
    s = m.summarize()
    # PR: at rank1 tp (p=1, r=0.5); rank2 fp (p=0.5, r=0.5)
    # 101-pt AP50 = mean over recall grid: 1.0 for r<=0.5 => 51/101
    assert np.isclose(s["AP50"], 51 / 101, atol=1e-6)


def test_wrong_class_is_fp():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (10, 10, 20, 20))])
    m.add_detections([_dt(1, 2, (10, 10, 20, 20), 0.9)])
    s = m.summarize()
    assert np.isclose(s["AP50"], 0.0)


def test_localization_threshold():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (0, 0, 10, 10))])
    # iou = 40/100 = 0.4 < 0.5 -> AP50 = 0
    m.add_detections([_dt(1, 1, (0, 0, 10, 4), 0.9)])
    s = m.summarize()
    assert np.isclose(s["AP50"], 0.0)
    # iou = 0.5 NOT > threshold handling: iou >= t matches (pycocotools uses
    # ratcheting from min(t, 1-eps); exactly t counts)
    m2 = COCOMeanAP()
    m2.add_gt_annotations([_gt(1, 1, (0, 0, 10, 10))])
    m2.add_detections([_dt(1, 1, (0, 0, 10, 20), 0.9)])  # iou=0.5
    assert np.isclose(m2.summarize()["AP50"], 1.0)


def test_crowd_gt_is_ignore():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (10, 10, 20, 20)),
                          _gt(1, 1, (100, 100, 50, 50), crowd=1)])
    # det inside the crowd region: matched to crowd => ignored, not FP
    m.add_detections([_dt(1, 1, (10, 10, 20, 20), 0.9),
                      _dt(1, 1, (110, 110, 20, 20), 0.8)])
    s = m.summarize()
    assert np.isclose(s["AP50"], 1.0)


def test_double_detection_second_is_fp():
    m = COCOMeanAP()
    m.add_gt_annotations([_gt(1, 1, (10, 10, 20, 20))])
    m.add_detections([_dt(1, 1, (10, 10, 20, 20), 0.9),
                      _dt(1, 1, (11, 11, 20, 20), 0.8)])
    s = m.summarize()
    # tp at rank 1 (r=1, p=1): precision envelope keeps AP50 = 1.0
    assert np.isclose(s["AP50"], 1.0)


def test_match_prefers_higher_iou_not_first_gt():
    ious = np.array([[0.6, 0.9]])
    m, ign = match_image(ious, np.array([False, False]),
                         np.array([False, False]), np.array([0.5]))
    assert m[0, 0] == 1  # best-iou gt wins
    assert not ign[0, 0]


def test_maxdet_caps():
    m = COCOMeanAP(max_dets=(1, 10, 100))
    m.add_gt_annotations([_gt(1, 1, (0, 0, 10, 10)),
                          _gt(1, 1, (50, 50, 10, 10))])
    m.add_detections([_dt(1, 1, (0, 0, 10, 10), 0.9),
                      _dt(1, 1, (50, 50, 10, 10), 0.8)])
    s = m.summarize()
    assert np.isclose(s["AR1"], 0.5)   # only top-1 det counted
    assert np.isclose(s["AR10"], 1.0)


def _random_scene(seed, n_imgs=6, n_cats=3):
    """Random COCO-format gt + detections exercising crowds, area ranges,
    score ties and cross-image merging."""
    rs = np.random.RandomState(seed)
    gts, dts = [], []
    aid = 0
    for img in range(n_imgs):
        for cat in range(1, n_cats + 1):
            for _ in range(rs.randint(0, 4)):
                w, h = rs.uniform(4, 150, 2)
                x, y = rs.uniform(0, 400, 2)
                gts.append({"id": aid, "image_id": img, "category_id": cat,
                            "bbox": [x, y, w, h], "area": w * h,
                            "iscrowd": int(rs.rand() < 0.15)})
                aid += 1
            for _ in range(rs.randint(0, 6)):
                w, h = rs.uniform(4, 150, 2)
                x, y = rs.uniform(0, 400, 2)
                # quantized scores force ties across images
                dts.append({"image_id": img, "category_id": cat,
                            "bbox": [float(x), float(y), float(w), float(h)],
                            "score": round(float(rs.rand()), 2)})
    # jittered copies of gt boxes so there are actual matches at high IoU
    for g in gts[::2]:
        x, y, w, h = g["bbox"]
        j = rs.uniform(-3, 3, 4)
        dts.append({"image_id": g["image_id"],
                    "category_id": g["category_id"],
                    "bbox": [x + j[0], y + j[1], max(w + j[2], 1),
                             max(h + j[3], 1)],
                    "score": round(float(rs.rand()), 2)})
    return gts, dts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_differential_vs_bruteforce_oracle(seed):
    """COCOMeanAP (vectorized + optional C++ matcher) must agree with the
    naive spec transcription in cocoeval_oracle.py on all 12 summary stats
    (VERDICT r1 item 5: independent oracle for the mAP metric)."""
    import cocoeval_oracle

    gts, dts = _random_scene(seed)
    m = COCOMeanAP()
    m.add_gt_annotations(gts)
    m.add_detections(dts)
    got = m.summarize()
    want = cocoeval_oracle.evaluate(gts, dts)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got, want)


def test_differential_python_matcher_vs_oracle():
    """Same differential but forcing the pure-python matcher (use_native
    False) so both the python and native paths are pinned to the oracle."""
    import cocoeval_oracle

    gts, dts = _random_scene(7)
    m = COCOMeanAP(use_native=False)
    m.add_gt_annotations(gts)
    m.add_detections(dts)
    got = m.summarize()
    want = cocoeval_oracle.evaluate(gts, dts)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_crowd_rematch_and_area_ignore_golden():
    """Analytic golden: a crowd GT can absorb several detections (ignored,
    not FPs) and an unmatched det with out-of-range area is ignored too."""
    gts = [
        {"id": 0, "image_id": 0, "category_id": 1,
         "bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 1},
        {"id": 1, "image_id": 0, "category_id": 1,
         "bbox": [200, 200, 50, 50], "area": 2500.0, "iscrowd": 0},
    ]
    dts = [
        # both overlap ONLY the crowd region (IoF >= 0.5): ignored
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 60, 60],
         "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [30, 30, 60, 60],
         "score": 0.8},
        # perfect match of the real gt
        {"image_id": 0, "category_id": 1, "bbox": [200, 200, 50, 50],
         "score": 0.7},
    ]
    m = COCOMeanAP()
    m.add_gt_annotations(gts)
    m.add_detections(dts)
    got = m.summarize()
    # 1 real gt, matched at every threshold, no fps -> AP = AP50 = 1
    assert got["AP"] == pytest.approx(1.0)
    assert got["AP50"] == pytest.approx(1.0)
    # the gt is "medium" area: small/large cells have no gt
    assert got["APm"] == pytest.approx(1.0)
    assert got["APs"] == -1.0 and got["APl"] == -1.0
