"""Native (C++/ctypes) COCO matcher vs the python oracle."""

import numpy as np
import pytest

from cocodet_tpu.evaluators.coco_metric import (RECALL_THRS, COCOMeanAP,
                                                match_image as py_match)

native = pytest.importorskip("cocodet_tpu.layers.fast_coco_eval")


@pytest.mark.parametrize("seed", range(5))
def test_match_fuzz(seed):
    rs = np.random.RandomState(seed)
    nd, ng = rs.randint(0, 50), rs.randint(0, 20)
    ious = rs.rand(nd, ng)
    ign = rs.rand(ng) < 0.3
    crd = ign & (rs.rand(ng) < 0.5)
    thrs = np.linspace(0.5, 0.95, 10)
    m1, i1 = native.match_image(ious, ign, crd, thrs)
    m2, i2 = py_match(ious, ign, crd, thrs)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(i1, i2)


def test_accumulate_pr_matches_numpy():
    rs = np.random.RandomState(0)
    nd, npig = 40, 25
    matched = rs.rand(nd) < 0.5
    ignored = (~matched) & (rs.rand(nd) < 0.2)
    prec, rec = native.accumulate_pr(matched, ignored, npig, RECALL_THRS)

    tp = np.cumsum(matched & ~ignored).astype(float)
    fp = np.cumsum(~matched & ~ignored).astype(float)
    rc = tp / npig
    pr = tp / np.maximum(tp + fp, np.spacing(1))
    q = np.maximum.accumulate(pr[::-1])[::-1]
    inds = np.searchsorted(rc, RECALL_THRS, side="left")
    expect = np.zeros(len(RECALL_THRS))
    valid = inds < nd
    expect[valid] = q[inds[valid]]
    np.testing.assert_allclose(prec, expect, atol=1e-12)
    assert rec == pytest.approx(rc[-1])


def test_metric_uses_native_when_available():
    m = COCOMeanAP(use_native=True)
    assert m._match is not py_match
