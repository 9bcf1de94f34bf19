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
