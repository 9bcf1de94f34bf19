"""StableHLO export roundtrip for the decoded (NMSResult-returning) graph.

The export family (tools/export_stablehlo.py / run_stablehlo.py) is the
TPU-native replacement for the reference's export_onnx/torchscript/trt
trio; this covers the serialization path that decoded artifacts need
(NMSResult namedtuple registration) with a bit-exact deserialize check.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import export as jexport  # noqa: E402

from cocodet_tpu.models import build_model  # noqa: E402
from cocodet_tpu.ops.nms import register_export_serialization  # noqa: E402
from cocodet_tpu.ops.postprocess import (PostprocessConfig,  # noqa: E402
                                         postprocess)

W, D = 0.25, 0.33


def test_decoded_export_roundtrip(tmp_path):
    register_export_serialization()
    register_export_serialization()  # idempotent

    model = build_model("yolox-p6", depth=D, width=W, fused=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 255,
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    cfg = PostprocessConfig(conf_threshold=1e-4, nms_threshold=0.55,
                            pre_nms_topk=128, max_det=16)

    def forward(images):
        return postprocess(model.apply(variables, images),
                           (8, 16, 32, 64), cfg)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(x.shape, x.dtype))
    blob = exported.serialize()
    path = tmp_path / "tiny.stablehlo"
    path.write_bytes(blob)

    restored = jexport.deserialize(bytearray(path.read_bytes()))
    ref = jax.device_get(forward(x))
    out = jax.device_get(restored.call(x))
    assert type(out).__name__ == "NMSResult"
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_allclose(np.asarray(ref.boxes), np.asarray(out.boxes),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(out.scores),
                               rtol=0, atol=0)
