"""TorchScript export: traced artifact round-trip + jax forward parity
(ref tools/export_torchscript.py:55-75 — jit.trace, decode off)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_export_torchscript_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from export_torchscript import export_torchscript
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.decode import attach_strides, concat_levels

    depth, width, size = 0.33, 0.25, 64
    model = build_model("yolox-p6", depth=depth, width=width)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, size, size, 3))))

    out = str(tmp_path / "tiny.torchscript.pt")
    diff = export_torchscript(variables, out, depth, width,
                              size=size, batch=1)
    assert diff < 1e-5
    assert os.path.getsize(out) > 10_000

    # the artifact is self-contained: load fresh and compare against the
    # jax forward (raw maps with sigmoid obj/cls, like the ONNX contract)
    loaded = torch.jit.load(out)
    x = (np.random.RandomState(0).rand(1, 3, size, size)
         .astype(np.float32) * 255.0)
    with torch.no_grad():
        ts_out = loaded(torch.from_numpy(x)).numpy()

    outputs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    preds, _, _ = concat_levels(attach_strides(outputs, (8, 16, 32, 64)))
    preds = np.asarray(preds)
    jax_out = np.concatenate(
        [preds[..., :4], 1.0 / (1.0 + np.exp(-preds[..., 4:]))], -1)

    assert ts_out.shape == jax_out.shape
    np.testing.assert_allclose(ts_out, jax_out, rtol=1e-3, atol=1e-3)
