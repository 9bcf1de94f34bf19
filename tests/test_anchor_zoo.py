"""Anchor-based model family (YOLOv5m6 / YOLOv4-P6) graph + decode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodet_tpu.models.anchor_zoo import (ANCHOR_MODELS, build_anchor_model,
                                           decode_anchor_outputs,
                                           make_divisible, mish)
from cocodet_tpu.ops.nms import batched_nms


def test_make_divisible():
    assert make_divisible(1024 * 0.75) == 768
    assert make_divisible(256 * 0.75) == 192
    assert make_divisible(63) == 64


def test_mish():
    import math

    x = jnp.asarray([0.0, 1.0])
    got = np.asarray(mish(x))
    expect = [0.0, 1.0 * math.tanh(math.log(1 + math.e))]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.parametrize("name,n_det_ch", [
    ("yolov5m6", 3 * 85),
    ("yolov4-p6", 4 * 85),
])
def test_anchor_model_forward(name, n_det_ch):
    model, anchors, strides = build_anchor_model(name, fused=True)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 4
    for o, s in zip(outs, strides):
        assert o.shape == (1, 128 // s, 128 // s, n_det_ch), (o.shape, s)


def test_anchor_decode_golden():
    # single level, one anchor: p=0 -> sigmoid=0.5
    # xy = (2*0.5 - 0.5 + grid) * s = (0.5 + grid) * s ; wh = 1 * anchor
    out = jnp.zeros((1, 2, 2, 1 * 85))
    boxes, obj, cls = decode_anchor_outputs(
        [out], anchors_px=[(10, 20)], strides=[8], num_classes=80)
    assert boxes.shape == (1, 4, 4)
    cx = (0.5 + 0) * 8
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               [cx - 5, cx - 10, cx + 5, cx + 10], atol=1e-5)
    np.testing.assert_allclose(np.asarray(obj), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cls), 0.25, atol=1e-6)


def test_anchor_decode_feeds_nms():
    rs = np.random.RandomState(0)
    outs = [jnp.asarray(rs.randn(2, 4, 4, 3 * 85), jnp.float32),
            jnp.asarray(rs.randn(2, 2, 2, 3 * 85), jnp.float32)]
    boxes, obj, cls = decode_anchor_outputs(
        outs, anchors_px=[(10, 13, 16, 30, 33, 23),
                          (30, 61, 62, 45, 59, 119)],
        strides=[8, 16], num_classes=80)
    score = jnp.max(cls, -1)
    klass = jnp.argmax(cls, -1).astype(jnp.int32)
    order = jnp.argsort(-score, axis=1)
    take = jax.vmap(lambda a, o: a[o])
    res = batched_nms(take(boxes, order), take(score, order),
                      take(klass, order), take(obj[..., 0], order),
                      jnp.ones_like(score, bool), max_det=10)
    assert res.boxes.shape == (2, 10, 4)


@pytest.mark.parametrize("name,levels", [("yolov4-p5", 3), ("yolov4-csp", 3)])
def test_anchor_model_v4_variants(name, levels):
    model, anchors, strides = build_anchor_model(name, fused=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == levels
    na = ANCHOR_MODELS[name]["num_anchors"]
    for o, s in zip(outs, strides):
        assert o.shape == (1, 64 // s, 64 // s, na * 85)


@pytest.mark.slow
def test_anchor_model_p7():
    model, anchors, strides = build_anchor_model("yolov4-p7", fused=True)
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 5
