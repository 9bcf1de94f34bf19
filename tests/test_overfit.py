"""Overfit smoke: the full training stack must drive loss down and produce
localized detections on a tiny synthetic set.

This is the strongest end-to-end correctness signal available without the
real COCO set: SimOTA assignment, losses, gradients, optimizer, EMA, decode
and NMS all have to cooperate for a detection to emerge at the right place.
Marked slow (~3-4 min on the 1-core CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cocodet_tpu.core.train_state import create_train_state, make_train_step
from cocodet_tpu.models import build_model
from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess


@pytest.mark.slow
def test_overfit_synthetic_box():
    rng = jax.random.PRNGKey(0)
    model = build_model("yolox-p6", depth=0.33, width=0.125)

    # 2 images, each a white square on gray at a known location
    imgs = np.full((2, 64, 64, 3), 80.0, np.float32)
    imgs[0, 16:40, 8:32] = 255.0    # box A: cx=20, cy=28, w=24, h=24
    imgs[1, 32:56, 32:56] = 255.0   # box B: cx=44, cy=44, w=24, h=24
    imgs = jnp.asarray(imgs)
    labels = jnp.asarray([
        [[3.0, 20.0, 28.0, 24.0, 24.0]] + [[0.0] * 5] * 4,
        [[7.0, 44.0, 44.0, 24.0, 24.0]] + [[0.0] * 5] * 4,
    ])

    lr = optax.linear_schedule(0.0, 2e-2, 20)  # warmup stand-in
    tx = optax.sgd(lr, momentum=0.9, nesterov=True)
    state = create_train_state(model, tx, rng, imgs, use_ema=False)
    step = make_train_step(model, tx, strides=(8, 16, 32, 64),
                           num_classes=80, donate=False)

    losses = []
    for _ in range(300):
        state, metrics = step(state, imgs, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses[-5:]
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # detections must localize: IoU > 0.5 with GT and correct class
    cfg = PostprocessConfig(conf_threshold=0.1, nms_threshold=0.5,
                            pre_nms_topk=128, max_det=5)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res = postprocess(model.apply(variables, imgs), (8, 16, 32, 64), cfg)
    valid = np.asarray(res.valid)
    assert valid[0].any() and valid[1].any(), "no detections after overfit"

    # a 150-step toy model still emits stray false positives; require that
    # a well-localized, correctly-classified detection exists in the top-5
    gts = np.array([[8, 16, 32, 40], [32, 32, 56, 56]], float)  # xyxy
    for i in range(2):
        best_iou, best_cls = 0.0, -1
        for j in range(np.asarray(res.valid)[i].sum()):
            box = np.asarray(res.boxes)[i, j]
            gt = gts[i]
            xx1, yy1 = max(box[0], gt[0]), max(box[1], gt[1])
            xx2, yy2 = min(box[2], gt[2]), min(box[3], gt[3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (box[2] - box[0]) * (box[3] - box[1])
            a2 = (gt[2] - gt[0]) * (gt[3] - gt[1])
            iou = inter / max(a1 + a2 - inter, 1e-9)
            if iou > best_iou:
                best_iou = iou
                best_cls = int(np.asarray(res.classes)[i, j])
        assert best_iou > 0.5, (i, best_iou)
        assert best_cls == int(labels[i, 0, 0]), (i, best_cls)


def test_loss_decreases_fast():
    """Default-tier convergence signal (~60 steps): the full jitted train
    step must drive loss down on a fixed synthetic batch. The slow
    test_overfit_synthetic_box additionally checks detection emergence."""
    rng = jax.random.PRNGKey(0)
    model = build_model("yolox-p6", depth=0.33, width=0.125)

    imgs = np.full((2, 64, 64, 3), 80.0, np.float32)
    imgs[0, 16:40, 8:32] = 255.0
    imgs[1, 32:56, 32:56] = 255.0
    imgs = jnp.asarray(imgs)
    labels = jnp.asarray([
        [[3.0, 20.0, 28.0, 24.0, 24.0]] + [[0.0] * 5] * 4,
        [[7.0, 44.0, 44.0, 24.0, 24.0]] + [[0.0] * 5] * 4,
    ])

    tx = optax.sgd(optax.linear_schedule(0.0, 2e-2, 20), momentum=0.9,
                   nesterov=True)
    state = create_train_state(model, tx, rng, imgs, use_ema=False)
    step = make_train_step(model, tx, strides=(8, 16, 32, 64),
                           num_classes=80, donate=False)
    losses = []
    for _ in range(60):
        state, metrics = step(state, imgs, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.75, (losses[0], losses[-1])
