"""ONNX export + self-contained numpy evaluation parity
(ref tools/export_onnx.py:56-113 + demo/ONNXRuntime/onnx_inference.py).

The artifact is produced by torch's C++ serializer from the bit-exact
torch bridge, validated by the compiled-in proto checker, then parsed and
EXECUTED by cocodet_tpu.utils.onnx_io (no onnx/onnxruntime in this env)
and compared against the jax forward."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_export_onnx_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from export_onnx import export_onnx
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.decode import attach_strides, concat_levels
    from cocodet_tpu.utils.onnx_io import load_onnx, run_onnx

    depth, width, size = 0.33, 0.25, 64
    model = build_model("yolox-p6", depth=depth, width=width)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, size, size, 3))))

    out = str(tmp_path / "tiny.onnx")
    nbytes = export_onnx(variables, out, depth, width, size=size, batch=1)
    assert nbytes > 10_000

    m = load_onnx(out)
    assert m.inputs == ["images"] and m.outputs == ["output"]
    ops = {n.op_type for n in m.nodes}
    assert "Conv" in ops and ("Resize" in ops or "Upsample" in ops)

    x = (np.random.RandomState(0).rand(1, 3, size, size)
         .astype(np.float32) * 255.0)
    (onnx_out,) = run_onnx(m, {"images": x})

    outputs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    preds, _, _ = concat_levels(attach_strides(outputs, (8, 16, 32, 64)))
    preds = np.asarray(preds)
    jax_out = np.concatenate(
        [preds[..., :4], 1.0 / (1.0 + np.exp(-preds[..., 4:]))], -1)

    assert onnx_out.shape == jax_out.shape
    np.testing.assert_allclose(onnx_out, jax_out, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_onnx_demo_tool(tmp_path):
    """End-to-end ONNX demo (ref demo/ONNXRuntime/onnx_inference.py):
    export a tiny artifact, run tools/onnx_demo.py on an image via the
    numpy evaluator backend, get an annotated image back."""
    import subprocess
    import sys

    import cv2
    import jax
    import jax.numpy as jnp

    from export_onnx import export_onnx
    from cocodet_tpu.models import build_model

    depth, width, size = 0.33, 0.25, 64
    model = build_model("yolox-p6", depth=depth, width=width)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, size, size, 3))))
    onnx_path = str(tmp_path / "tiny.onnx")
    export_onnx(variables, onnx_path, depth, width, size=size, batch=1)

    img = np.full((96, 128, 3), 120, np.uint8)
    cv2.rectangle(img, (20, 20), (70, 70), (255, 255, 255), -1)
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, img)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "onnx_demo.py"),
         "-m", onnx_path, "-i", img_path, "-o", out_dir,
         "--input-shape", "64,64", "-s", "1e-4"],
        capture_output=True, text=True, timeout=500, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "wrote" in proc.stdout
    assert os.path.exists(os.path.join(out_dir, "in.jpg"))


# -------------------------------------------------------------------------
# jaxpr -> ONNX exporter (utils/onnx_export.py): dense / slim / w8a8
# round-trips through the in-repo numpy evaluator (round 4; the edge
# recipe's artifact classes, tools/export_edge.py).
# -------------------------------------------------------------------------


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.models import build_model
from cocodet_tpu.ops.decode import attach_strides, concat_levels
from cocodet_tpu.utils.onnx_export import export_fn_to_onnx
from cocodet_tpu.utils.onnx_io import load_onnx, run_onnx

D, W, S = 0.33, 0.25, 64


def _flat_fwd(model, variables):
    def fwd(x):
        outs = attach_strides(model.apply(variables, x), (8, 16, 32, 64))
        preds, _, _ = concat_levels(outs)
        return jnp.concatenate(
            [preds[..., :4], jax.nn.sigmoid(preds[..., 4:])], axis=-1)

    return fwd


@pytest.fixture(scope="module")
def probe():
    return (np.random.RandomState(0).rand(1, S, S, 3) * 255
            ).astype(np.float32)


def _roundtrip(fwd, probe, tmp_path, tol):
    path = str(tmp_path / "m.onnx")
    nbytes = export_fn_to_onnx(fwd, (jnp.zeros_like(jnp.asarray(probe)),),
                               path)
    want = np.asarray(fwd(jnp.asarray(probe)), np.float32)
    got = run_onnx(load_onnx(path), {"images": probe})[0]
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < tol, err
    return nbytes


def test_onnx_export_dense(tmp_path, probe):
    m = build_model("yolox-p6", depth=D, width=W, fused=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    _roundtrip(_flat_fwd(m, v), probe, tmp_path, 1e-5)


def test_onnx_export_slim(tmp_path, probe):
    """Channel-slimmed widths export 1:1 — the capability the torch-donor
    exporter (fixed reference topology) cannot provide."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    from cocodet_tpu.compress import merge_for_deployment, slim_channels

    masked = build_model("yolox-p6", depth=D, width=W, use_mask=True)
    variables = dict(masked.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, S, S, 3), jnp.float32)))
    masks = dict(flatten_dict(variables["masks"]))
    rs = np.random.RandomState(1)
    for path in list(masks):
        if path[-2:] == ("mask", "scale"):
            scale = np.asarray(masks[path]).copy()
            kill = rs.rand(scale.shape[0]) < 0.3
            kill[0] = False
            scale[kill] = 0.0
            masks[path] = jnp.asarray(scale)
    variables["masks"] = unflatten_dict(masks)
    merged = merge_for_deployment(variables, eps=1e-3)
    slimmed, spec = slim_channels(merged, variables["masks"])
    sm = build_model("yolox-p6", depth=D, width=W, fused=True, slim=spec)
    _roundtrip(_flat_fwd(sm, slimmed), probe, tmp_path, 1e-5)


def test_onnx_export_w8a8(tmp_path, probe):
    """The int8 deployment graph exports in float-QDQ form and stays
    value-faithful (integer-grid values carried in f32)."""
    from cocodet_tpu.compress import quantize_model

    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    v = dict(fused.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, S, S, 3), jnp.float32)))
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(2, S, S, 3) * 255, jnp.float32)
    qvars = quantize_model(calib, v, [imgs], per_channel_act=True)
    qm = build_model("yolox-p6", depth=D, width=W, fused=True,
                     quant="w8a8")
    _roundtrip(_flat_fwd(qm, qvars), probe, tmp_path, 1e-4)


def test_onnx_export_live_consts_only(tmp_path, probe):
    """Pre-transpose kernel constants must not leak into the file: every
    initializer is referenced by some node."""
    m = build_model("yolox-p6", depth=D, width=W, fused=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    path = str(tmp_path / "m.onnx")
    export_fn_to_onnx(_flat_fwd(m, v), (jnp.zeros((1, S, S, 3)),), path)
    model = load_onnx(path)
    used = {n for node in model.nodes for n in node.inputs}
    unused = [nm for nm in model.initializers if nm not in used]
    assert not unused, unused[:5]


@pytest.mark.slow
def test_export_edge_tool(tmp_path):
    """tools/export_edge.py end-to-end: ckpt -> ONNX + calib JSON with the
    built-in selfcheck gating success (the mobile recipe entry point,
    serving/EDGE.md)."""
    import json
    import os
    import subprocess
    import sys

    from flax import serialization

    m = build_model("yolox-p6", depth=D, width=W, fused=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))
    state = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict({"model": dict(v)}))
    ckpt = tmp_path / "fused.msgpack"
    ckpt.write_bytes(serialization.msgpack_serialize(state))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "edge.onnx"
    calib = tmp_path / "edge.scales.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_edge.py"),
         "--cpu", "-c", str(ckpt), "--depth", str(D), "--width", str(W),
         "--size", "64", "-o", str(out), "--calib-json", str(calib)],
        capture_output=True, text=True, timeout=500, cwd=repo)
    assert proc.returncode == 0, proc.stdout[-1500:] + proc.stderr[-1500:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["selfcheck_max_err"] < 1e-4
    assert out.exists() and calib.exists()
