"""Int8 PTQ: calibration, weight quantization, and w8a8 forward accuracy
on the fused (BN-folded) model (compress/quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.compress import (quantization_report, quantize_model)
from cocodet_tpu.models import build_model

D, W, S = 0.33, 0.25, 64


@pytest.fixture(scope="module")
def fused_setup():
    # start from a trained-looking fused model: random init of the fused
    # topology (conv+bias) with non-trivial bias
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = dict(fused.init(rng, x0))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, S, S, 3) * 255, jnp.float32)
    return variables, imgs


def _flat_outputs(model, variables, imgs):
    outs = model.apply(dict(variables), imgs)
    return np.concatenate([np.asarray(o, np.float32).ravel()
                           for level in outs
                           for o in (level["reg"], level["obj"],
                                     level["cls"])])


def test_w8a8_forward_close(fused_setup):
    variables, imgs = fused_setup
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")

    qvars = quantize_model(calib, variables, [imgs])

    rep = quantization_report(qvars)
    assert rep["quantized_convs"] > 50  # backbone+fpn+towers all covered
    assert rep["int8_bytes"] > rep["float_bytes"]  # most params now int8

    ref = _flat_outputs(fused, variables, imgs)
    got = _flat_outputs(q, qvars, imgs)
    assert got.shape == ref.shape
    # int8 PTQ tolerance: raw map error small relative to the dynamic range
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert err.max() / scale < 0.15, err.max() / scale
    assert np.percentile(err, 99) / scale < 0.05


def test_w8a8_requires_quant_model(fused_setup):
    variables, imgs = fused_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")
    qvars = quantize_model(calib, variables, [imgs])
    # running int8 params through a non-quant model must fail loudly
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    with pytest.raises(ValueError, match="int8 kernel"):
        fused.apply(dict(qvars), imgs)


def test_head_preds_stay_float(fused_setup):
    variables, imgs = fused_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")
    qvars = quantize_model(calib, variables, [imgs])
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(qvars["params"])
    preds = {p: v for p, v in flat.items()
             if any("_pred" in part for part in p) and p[-1] == "kernel"}
    assert preds, "expected head prediction convs in the tree"
    assert all(v.dtype != jnp.int8 for v in preds.values())
