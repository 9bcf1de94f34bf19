"""Numerical parity of the anchor zoo vs the reference torch predictors
(used as test oracles only): yolov5m6 (ref submit/models/yolo.py) and
yolov4-csp (ref submit/yolov4_infer/models/yolov4.py).

Random torch init -> copy weights into AnchorDetector -> compare decoded
outputs elementwise (VERDICT r1 item 6)."""

import os
import re
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from cocodet_tpu.models import build_anchor_model, decode_anchor_outputs  # noqa: E402

REF = "/root/reference"
V5_DIR = os.path.join(REF, "submit")
V4_DIR = os.path.join(REF, "submit", "yolov4_infer")


def _torch_key(path, detect_prefix):
    """Flax param path tuple -> torch state_dict key."""
    parts = []
    for comp in path[:-1]:
        m = re.match(r"l(\d+)_", comp)
        if m:
            parts.append(f"model.{int(m.group(1))}")
        elif comp.startswith("detect_m"):
            parts.append(f"{detect_prefix}.m.{int(comp[len('detect_m'):])}")
        elif comp == "ConvBnAct_0":
            continue
        elif re.fullmatch(r"m\d+", comp):
            parts.append(f"m.{int(comp[1:])}")
        else:
            parts.append(comp)
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "weight": "weight",  # AffineGate fused per-channel affine
            "mean": "running_mean", "var": "running_var"}[path[-1]]
    return ".".join(parts + [leaf])


def _copy_weights(variables, state_dict, detect_prefix):
    """Fill every flax leaf from the torch state_dict (strict)."""
    out = {}
    for coll in variables:
        flat = flatten_dict(variables[coll])
        new = {}
        for path, v in flat.items():
            tk = _torch_key(path, detect_prefix)
            assert tk in state_dict, f"missing torch key {tk} for {path}"
            t = state_dict[tk].detach().numpy()
            if path[-1] == "kernel":
                t = np.transpose(t, (2, 3, 1, 0))  # OIHW -> HWIO
            assert t.shape == np.shape(v), (path, t.shape, np.shape(v))
            new[path] = jnp.asarray(t)
        out[coll] = unflatten_dict(new)
    return out


def _randomize(model, gen):
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.05, 0.05, generator=gen)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)


def _spatial_major(t_out, shapes, na, no):
    """Reorder the torch Detect cat (anchor-major per level) to this
    framework's spatial-major order, per level."""
    chunks, start = [], 0
    for (ny, nx) in shapes:
        n = na * ny * nx
        blk = t_out[:, start:start + n].reshape(-1, na, ny, nx, no)
        chunks.append(np.transpose(blk, (0, 2, 3, 1, 4)).reshape(
            t_out.shape[0], -1, no))
        start += n
    return np.concatenate(chunks, axis=1)


def _compare(t_dec, boxes, obj, cls, num_classes):
    """t_dec: (B, A, 5+C) decoded torch output in spatial-major order."""
    t_xy, t_wh = t_dec[..., 0:2], t_dec[..., 2:4]
    t_boxes = np.concatenate([t_xy - t_wh / 2, t_xy + t_wh / 2], -1)
    t_obj = t_dec[..., 4:5]
    t_cls = t_dec[..., 5:] * t_obj
    np.testing.assert_allclose(np.asarray(boxes), t_boxes,
                               atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(obj), t_obj, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), t_cls, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(V5_DIR), reason="reference missing")
def test_yolov5m6_forward_parity():
    sys.path.insert(0, V5_DIR)
    try:
        from models.yolo import Model
    finally:
        sys.path.remove(V5_DIR)

    torch.manual_seed(0)
    ref = Model(cfg=os.path.join(V5_DIR, "models", "yolov5m6.yaml"))
    _randomize(ref, torch.Generator().manual_seed(1))
    ref.eval()

    model, anchors, strides = build_anchor_model("yolov5m6", fused=False)
    size = 128
    x = np.random.RandomState(2).rand(1, size, size, 3).astype(np.float32)
    variables = jax.jit(lambda r, im: model.init(r, im, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(x))
    variables = _copy_weights(dict(variables), ref.state_dict(), "model.33")

    outs = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, jnp.asarray(x))
    boxes, obj, cls = decode_anchor_outputs(outs, anchors, strides, 80)

    with torch.no_grad():
        t_out = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    shapes = [(size // s, size // s) for s in strides]
    t_dec = _spatial_major(t_out, shapes, na=3, no=85)
    _compare(t_dec, boxes, obj, cls, 80)


@pytest.mark.skipif(not os.path.isdir(V4_DIR), reason="reference missing")
def test_yolov4_csp_forward_parity():
    # the v5 test imports a different package also named "models" — evict it
    for k in [k for k in sys.modules if k == "models"
              or k.startswith("models.")]:
        del sys.modules[k]
    sys.path.insert(0, V4_DIR)
    try:
        import models.yolov4 as m4
        from models.common import Bottleneck
        from models.yolov4 import YOLOv4

        # the reference's parse_model evals "Bottleneck" from the csp yaml
        # but yolov4.py neither imports it nor whitelists it for the
        # [c1, c2] arg rewrite — the csp predictor is latently unbuildable
        # upstream. Inject a shim with the upstream-ScaledYOLOv4 semantics
        # (row [64] means c1=prev, c2=64) so the oracle builds.
        class _B(Bottleneck):
            def __init__(self, c1, c2=None, *a, **k):
                super().__init__(c1, c2 if c2 is not None else c1, *a, **k)

        m4.Bottleneck = _B
    finally:
        sys.path.remove(V4_DIR)
        for k in [k for k in sys.modules if k == "models"
                  or k.startswith("models.")]:
            del sys.modules[k]

    torch.manual_seed(0)
    ref = YOLOv4(cfg=os.path.join(V4_DIR, "models", "yolov4-csp.yaml"))
    _randomize(ref, torch.Generator().manual_seed(3))
    ref.eval()

    model, anchors, strides = build_anchor_model("yolov4-csp", fused=True)
    size = 128
    x = np.random.RandomState(4).rand(1, size, size, 3).astype(np.float32)
    variables = jax.jit(lambda r, im: model.init(r, im, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(x))
    detect_li = len(model.spec) - 1
    variables = _copy_weights(dict(variables), ref.state_dict(),
                              f"model.{detect_li}")

    outs = jax.jit(lambda v, im: model.apply(v, im, train=False))(
        variables, jnp.asarray(x))
    boxes, obj, cls = decode_anchor_outputs(outs, anchors, strides, 80)

    with torch.no_grad():
        t_out = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))[0].numpy()
    shapes = [(size // s, size // s) for s in strides]
    t_dec = _spatial_major(t_out, shapes, na=3, no=85)
    _compare(t_dec, boxes, obj, cls, 80)
