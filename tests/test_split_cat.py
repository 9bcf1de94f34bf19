"""Split-concat deployment graph (models/pafpn.py split_cat): the FPN merge
concats feed only 1x1 CSP entry convs, so the rewrite
conv(cat(up(a), b)) -> up(conv_a(a)) + conv_b(b) must be numerically
equivalent on the same checkpoint — tight in f32, bit-exact in w8a8 int8
(integer partial sums).  Ref context: the concat merge points are ref
yolox/models/yolo_pafpn_p6.py:143-180; the reference has no analog of this
rewrite (it is a TPU HBM-traffic optimization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.compress import quantize_model
from cocodet_tpu.models import build_model

D, W, S = 0.33, 0.25, 64


@pytest.fixture(scope="module")
def fused_setup():
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    rng = jax.random.PRNGKey(0)
    variables = dict(fused.init(rng, jnp.zeros((1, S, S, 3), jnp.float32)))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, S, S, 3) * 255, jnp.float32)
    return variables, imgs


def _flat(model, variables, imgs):
    outs = model.apply(dict(variables), imgs)
    return np.concatenate([np.asarray(o, np.float32).ravel()
                           for level in outs
                           for o in (level["reg"], level["obj"],
                                     level["cls"])])


def test_split_cat_f32_parity(fused_setup):
    variables, imgs = fused_setup
    plain = build_model("yolox-p6", depth=D, width=W, fused=True)
    split = build_model("yolox-p6", depth=D, width=W, fused=True,
                        split_cat=True)
    # same param tree (kernel keeps the full concat-width shape)
    chex_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    split_shapes = jax.tree_util.tree_map(
        jnp.shape, split.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, S, S, 3)))["params"])
    assert chex_shapes == split_shapes
    ref = _flat(plain, variables, imgs)
    got = _flat(split, variables, imgs)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("per_channel", [False, True])
def test_split_cat_w8a8_bit_exact(fused_setup, per_channel):
    """int8: partial sums accumulate in int32, so the split graph is
    bit-identical to the materialized-concat graph on the same quantized
    checkpoint — whichever calib graph produced it."""
    variables, imgs = fused_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    calib_split = build_model("yolox-p6", depth=D, width=W, fused=True,
                              quant="calib", split_cat=True)
    q_plain = build_model("yolox-p6", depth=D, width=W, fused=True,
                          quant="w8a8")
    q_split = build_model("yolox-p6", depth=D, width=W, fused=True,
                          quant="w8a8", split_cat=True)

    qvars = quantize_model(calib, variables, [imgs],
                           per_channel_act=per_channel)
    # the split calib graph sows near-identical scales (its float partial
    # sums perturb downstream activations by ULPs, so only allclose holds)
    qvars_s = quantize_model(calib_split, variables, [imgs],
                             per_channel_act=per_channel)
    for a, b in zip(jax.tree_util.tree_leaves(qvars["quant"]),
                    jax.tree_util.tree_leaves(qvars_s["quant"])):
        # atol floor: per-channel scales on near-zero-range channels are
        # ~1e-9 and ULP-sensitive to the calib graph's partial-sum rounding
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-12)

    # the hard claim: on the SAME quantized artifact, split inference is
    # bit-identical (int32 partial sums are exact)
    ref = _flat(q_plain, qvars, imgs)
    got = _flat(q_split, qvars, imgs)
    np.testing.assert_array_equal(got, ref)


def test_split_cat_rejects_remat():
    """remat (jax.checkpoint) would trace the static up2x part flags into
    tracers — the combination is refused at model build (models/yolox.py)."""
    model = build_model("yolox-p6", depth=D, width=W, fused=True,
                        split_cat=True, remat=True)
    with pytest.raises(ValueError, match="remat"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))


def test_parts_guards_raise():
    """Conv2d parts-mode preconditions are hard errors, not asserts: a
    grouped conv or a non-pointwise conv fed up2x parts would compute
    silently wrong numerics (the upsample commute only holds for 1x1/s1)."""
    from cocodet_tpu.models.blocks import Conv2d

    a = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError, match="groups"):
        Conv2d(features=8, kernel_size=1, groups=2).init(
            jax.random.PRNGKey(0), [a, a])
    with pytest.raises(ValueError, match="pointwise"):
        Conv2d(features=8, kernel_size=3).init(
            jax.random.PRNGKey(0), [(a, True), (a, False)])
