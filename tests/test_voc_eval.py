"""VOC mAP metric goldens (hand-computed; ref yolox/evaluators/voc_eval.py
semantics: greedy IoU-0.5 matching, difficult GTs neither tp nor fp,
07 11-point vs 12 all-point AP)."""

import numpy as np

from cocodet_tpu.evaluators.voc_evaluator import eval_class, voc_ap


def test_voc_ap_12_metric_single_point():
    # one det, recall jumps to 0.5 at precision 1.0
    ap = voc_ap(np.array([0.5]), np.array([1.0]), use_07_metric=False)
    np.testing.assert_allclose(ap, 0.5)


def test_voc_ap_07_metric_single_point():
    # 11-point: p=1 at t in {0,.1,...,.5} -> 6/11
    ap = voc_ap(np.array([0.5]), np.array([1.0]), use_07_metric=True)
    np.testing.assert_allclose(ap, 6.0 / 11.0)


def test_eval_class_perfect():
    gts = {0: (np.array([[10, 10, 50, 50], [100, 100, 150, 150]], float),
               np.zeros(2, bool))}
    dets = [(0, 0.9, np.array([10, 10, 50, 50], float)),
            (0, 0.8, np.array([100, 100, 150, 150], float))]
    for m in (False, True):
        np.testing.assert_allclose(eval_class(dets, gts, use_07_metric=m),
                                   1.0)


def test_eval_class_difficult_is_neither_tp_nor_fp():
    gts = {0: (np.array([[10, 10, 50, 50], [100, 100, 150, 150]], float),
               np.array([True, False]))}
    dets = [(0, 0.9, np.array([10, 10, 50, 50], float)),   # difficult hit
            (0, 0.8, np.array([100, 100, 150, 150], float))]
    # npos = 1 (non-difficult), the difficult match is discarded -> AP 1.0
    np.testing.assert_allclose(eval_class(dets, gts), 1.0)


def test_eval_class_double_detection_second_is_fp():
    gts = {0: (np.array([[10, 10, 50, 50]], float), np.zeros(1, bool))}
    dets = [(0, 0.9, np.array([10, 10, 50, 50], float)),
            (0, 0.8, np.array([11, 11, 51, 51], float))]  # same gt, taken
    # recall reaches 1.0 at the first det; trailing fp doesn't lower 12-AP
    np.testing.assert_allclose(eval_class(dets, gts), 1.0)
    # ...but a LEADING fp does
    dets_rev = [(0, 0.9, np.array([200, 200, 240, 240], float)),
                (0, 0.8, np.array([10, 10, 50, 50], float))]
    np.testing.assert_allclose(eval_class(dets_rev, gts), 0.5)


def test_eval_class_miss_halves_recall():
    gts = {0: (np.array([[10, 10, 50, 50]], float), np.zeros(1, bool)),
           1: (np.array([[10, 10, 50, 50]], float), np.zeros(1, bool))}
    dets = [(0, 0.9, np.array([10, 10, 50, 50], float))]  # img 1 missed
    np.testing.assert_allclose(eval_class(dets, gts), 0.5)
