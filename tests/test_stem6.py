"""Focus -> 6x6 stride-2 conv stem rewrite: exact-equivalence tests
(ops/fuse.py fold_focus_stem / fold_focus_quant, darknet.py stem6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.compress import quantize_model
from cocodet_tpu.models import build_model
from cocodet_tpu.ops.fuse import fold_focus_quant, fold_focus_stem

D, W, S = 0.33, 0.25, 64


def _flat_outputs(model, variables, imgs):
    outs = model.apply(dict(variables), imgs)
    return np.concatenate([np.asarray(o, np.float32).ravel()
                           for level in outs
                           for o in (level["reg"], level["obj"],
                                     level["cls"])])


@pytest.mark.parametrize("name,order", [
    ("yolox-p6", "pixel_unshuffle"),   # FocusCustom, ref network_blocks.py:350-361
    ("yolox", "slice_cat"),            # original Focus, ref network_blocks.py:333-346
])
def test_fold_focus_stem_exact(name, order):
    fused = build_model(name, depth=D, width=W, fused=True)
    rng = jax.random.PRNGKey(0)
    variables = dict(fused.init(rng, jnp.zeros((1, S, S, 3), jnp.float32)))
    imgs = jnp.asarray(
        np.random.RandomState(1).rand(2, S, S, 3) * 255, jnp.float32)
    ref = _flat_outputs(fused, variables, imgs)

    stem6 = build_model(name, depth=D, width=W, fused=True, stem6=True)
    folded = {"params": fold_focus_stem(variables["params"], order=order)}
    # the rewrite is a pure permutation of kernel entries; only f32
    # accumulation order differs
    got = _flat_outputs(stem6, folded, imgs)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # param count unchanged (6*6*3 == 3*3*12)
    n = lambda t: sum(int(np.prod(v.shape))
                      for v in jax.tree_util.tree_leaves(t))
    assert n(folded["params"]) == n(variables["params"])


def test_fold_focus_stem_int8_exact():
    """In w8a8 the stem conv is integer: the fold must be bit-faithful
    (same products, exact int32 accumulation)."""
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    rng = jax.random.PRNGKey(0)
    variables = dict(fused.init(rng, jnp.zeros((1, S, S, 3), jnp.float32)))
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(2, S, S, 3) * 255, jnp.float32)

    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    qvars = quantize_model(calib, variables, [imgs])
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")
    ref = _flat_outputs(q, qvars, imgs)

    q6 = build_model("yolox-p6", depth=D, width=W, fused=True,
                     quant="w8a8", stem6=True)
    folded = {"params": fold_focus_stem(qvars["params"],
                                        order="pixel_unshuffle"),
              "quant": fold_focus_quant(qvars["quant"])}
    got = _flat_outputs(q6, folded, imgs)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)

    # the stem kernel stayed int8 through the fold
    k6 = folded["params"]["backbone"]["backbone"]["stem"]["conv"]["kernel"]
    assert k6.shape == (6, 6, 3, k6.shape[-1]) and k6.dtype == jnp.int8


def test_harness_stem6_config(tmp_path):
    """The harness "stem6": true config flag folds the loaded checkpoint
    and serves the same numbers (harness/main.py build_model_and_vars)."""
    import importlib
    import os
    import sys

    import numpy as np
    from flax import serialization

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "harness"))
    hmain = importlib.import_module("main")

    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    variables = dict(fused.init(jax.random.PRNGKey(3),
                                jnp.zeros((1, S, S, 3), jnp.float32)))
    ckpt = str(tmp_path / "fused.msgpack")
    state = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict({"params": variables["params"]}))
    with open(ckpt, "wb") as f:
        f.write(serialization.msgpack_serialize(state))

    cfg = {"model": {"type": "yolox-p6", "depth": D, "width": W},
           "ckpt": ckpt, "half": False}
    imgs = jnp.asarray(
        np.random.RandomState(4).rand(1, S, S, 3) * 255, jnp.float32)
    m0, v0 = hmain.build_model_and_vars(cfg)
    m6, v6 = hmain.build_model_and_vars({**cfg, "stem6": True})
    np.testing.assert_allclose(_flat_outputs(m6, v6, imgs),
                               _flat_outputs(m0, v0, imgs),
                               rtol=1e-4, atol=1e-4)
