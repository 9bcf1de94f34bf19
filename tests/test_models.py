"""Shape + topology goldens for the model zoo.

Channel plans cross-checked against the reference:
  P6 backbone plan   ref yolox/models/darknet_p6.py:28-121
  P6 PAFPN plan      ref yolox/models/yolo_pafpn_p6.py:143-180
  head towers        ref yolox/models/yolo_head_custom.py:38-113

CPU in this image is a single core and flax init of the full-size model is
minutes-slow, so routine tests run a narrow (width=0.25, depth=0.33) model;
the full-size competition config is covered by test_full_scale (marked slow)
and by the torch-parity oracle test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.models import CSPBackbone, YOLOPAFPN, build_model

W, D = 0.25, 0.33  # tiny test scale: base_channels=16, base_depth=1


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def tiny_p6():
    model = build_model("yolox-p6", depth=D, width=W)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    return model, vars_, x


def test_backbone_channels_p6():
    # base=16: dark3 x4=64, dark4 x8=128, dark5 x12=192, dark6 x16=256
    m = CSPBackbone(variant="p6", depth=D, width=W,
                    out_features=("dark3", "dark4", "dark5", "dark6"))
    x = jnp.zeros((1, 64, 64, 3))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    for k, (s, c) in {"dark3": (8, 64), "dark4": (16, 128),
                      "dark5": (32, 192), "dark6": (64, 256)}.items():
        assert out[k].shape == (1, 64 // s, 64 // s, c), (k, out[k].shape)


def test_backbone_channels_standard():
    # base=16 (w=0.25): dark3 64, dark4 128, dark5 256 (ref darknet.py:121-157)
    m = CSPBackbone(variant="standard", depth=D, width=W,
                    out_features=("dark3", "dark4", "dark5"), act="silu")
    x = jnp.zeros((1, 64, 64, 3))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out["dark3"].shape == (1, 8, 8, 64)
    assert out["dark4"].shape == (1, 4, 4, 128)
    assert out["dark5"].shape == (1, 2, 2, 256)


def test_backbone_channels_custom_variants():
    for variant in ("custom", "p6v2"):
        m = CSPBackbone(variant=variant, depth=D, width=W,
                        out_features=("dark5",))
        x = jnp.zeros((1, 64, 64, 3))
        out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert out["dark5"].shape[-1] == 16 * 12  # x12 plan for both


def test_pafpn_p6_output_plan():
    m = YOLOPAFPN(variant="p6", depth=D, width=W)
    x = jnp.zeros((1, 64, 64, 3))
    outs = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    # (pan_out3..pan_out0) at /8,/16,/32,/64 widths 64,128,192,256
    # ref yolo_pafpn_p6.py:143-180 channel plan scaled by width
    assert [o.shape for o in outs] == [
        (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 192), (1, 1, 1, 256)]


def test_yolox_p6_forward_shapes(tiny_p6):
    model, vars_, x = tiny_p6
    outs = model.apply(vars_, x)
    assert len(outs) == 4
    for o, s in zip(outs, (8, 16, 32, 64)):
        assert o["reg"].shape == (1, 64 // s, 64 // s, 4)
        assert o["obj"].shape == (1, 64 // s, 64 // s, 1)
        assert o["cls"].shape == (1, 64 // s, 64 // s, 80)


def test_distillation_taps(tiny_p6):
    model, vars_, x = tiny_p6
    outs, taps = model.apply(vars_, x, return_taps=True)
    # P6 return_all exposes 10 maps: 4 backbone + 2 td + 4 pan
    # (ref yolox/models/yolox_p6.py:48-52)
    assert len(taps["backbone"]) == 4
    assert len(taps["td"]) == 2
    assert len(taps["pan"]) == 4


def test_head_bias_prior(tiny_p6):
    import math
    _, vars_, _ = tiny_p6
    b = vars_["params"]["head"]["cls_pred0"]["bias"]
    expect = -math.log((1 - 1e-2) / 1e-2)
    assert np.allclose(np.asarray(b), expect)


def test_fused_topology_has_no_bn():
    model = build_model("yolox-p6", depth=D, width=W, fused=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(vars_)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("'bn'" in n for n in names), [n for n in names if "'bn'" in n][:3]
    assert "batch_stats" not in vars_
    assert len(model.apply(vars_, x)) == 4


def test_masks_collection():
    model = build_model("yolox-p6", depth=D, width=W,
                        use_mask=True, weight_mask=True)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    assert "masks" in vars_
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(vars_["masks"])
    assert flat, "no masks created"
    for path, m in flat.items():
        if path[-1] in ("scale", "conv_mask"):
            assert bool(jnp.all(m == 1.0)), path   # pass-through at init
        elif path[-1] == "offset":
            assert bool(jnp.all(m == 0.0)), path   # no constant injected


@pytest.mark.slow
def test_full_scale_param_count():
    """Dense YOLOX-M-P6 (d=0.67, w=0.75) — the competition model
    (ref exps/p6/yolox_m_p6.py:13-14). Param golden pinned by
    tests/test_torch_parity.py against the torch reference."""
    model = build_model("yolox-p6", depth=0.67, width=0.75)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    total = n_params(vars_["params"])
    assert 30e6 < total < 60e6, total


def test_yolo_fpn_legacy():
    from cocodet_tpu.models import YOLOFPN

    m = YOLOFPN(depth=21)  # 21-depth keeps the test light
    x = jnp.zeros((1, 64, 64, 3))
    outs = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    # (out_dark3/8 x 128ch emb-out? widths: out2 ends at 128), dark4 at 256,
    # dark5 at 512 (ref yolo_fpn.py:22-28 widths)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_depthwise_variant_forward():
    model = build_model("yolox-dw", depth=D, width=W)
    x = jnp.zeros((1, 64, 64, 3))
    outs = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert len(outs) == 3
    assert outs[0]["cls"].shape == (1, 8, 8, 80)
