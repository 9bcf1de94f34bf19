"""Native letterbox kernel vs the cv2 reference path."""

import numpy as np
import pytest

from cocodet_tpu.data.transforms import letterbox

fp = pytest.importorskip("cocodet_tpu.layers.fast_preproc")


@pytest.mark.skipif(not fp.available(), reason="toolchain unavailable")
@pytest.mark.parametrize("hw", [(100, 80), (60, 120), (640, 480)])
def test_native_matches_cv2(hw):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (*hw, 3), np.uint8)
    out_n, r_n = fp.letterbox(img, (64, 64))
    out_c, r_c = letterbox(img, (64, 64), use_native=False)
    assert r_n == pytest.approx(r_c, rel=1e-6)
    assert out_n.shape == out_c.shape == (64, 64, 3)
    # both use the INTER_LINEAR pixel-center convention; allow 1-LSB
    # rounding differences (cv2 fixed-point vs float)
    diff = np.abs(out_n - out_c)
    assert float(diff.mean()) < 0.6, float(diff.mean())
    assert float(np.percentile(diff, 99)) <= 2.0


@pytest.mark.skipif(not fp.available(), reason="toolchain unavailable")
def test_native_pad_region():
    img = np.full((50, 100, 3), 200, np.uint8)
    out, r = fp.letterbox(img, (64, 64))
    # content occupies 32 rows; rest must be the 114 fill
    assert np.allclose(out[40:], 114.0)
    assert out[:31, :63].mean() > 190
