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


def test_w8a8_per_channel_act(fused_setup):
    """Per-input-channel activation scales (quantize_model per_channel_act):
    same runtime graph (vector scale folded into the int8 kernel), accuracy
    at least as good as per-tensor on the raw maps, stem stays scalar."""
    variables, imgs = fused_setup
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")

    qv_t = quantize_model(calib, variables, [imgs])
    qv_c = quantize_model(calib, variables, [imgs], per_channel_act=True)

    from flax.traverse_util import flatten_dict

    scales = {p: v for p, v in flatten_dict(qv_c["quant"]).items()
              if p[-1] == "act_scale"}
    assert any(v.ndim == 1 for v in scales.values()), \
        "per-channel mode produced no vector scales"
    # the Focus stem must stay per-tensor (stem6 fold exactness)
    stem = [v for p, v in scales.items()
            if p[:3] == ("backbone", "backbone", "stem")]
    assert stem and all(v.ndim == 0 for v in stem)

    ref = _flat_outputs(fused, variables, imgs)
    err_t = np.abs(_flat_outputs(q, qv_t, imgs) - ref)
    err_c = np.abs(_flat_outputs(q, qv_c, imgs) - ref)
    scale = np.abs(ref).max()
    assert err_c.max() / scale < 0.15
    # finer grid: aggregate error should not regress vs per-tensor
    assert np.mean(err_c) <= np.mean(err_t) * 1.05, \
        (np.mean(err_c), np.mean(err_t))


def test_per_channel_fold_math():
    """The kernel fold is exact: conv(round(x/s_c), q) * w_scale equals the
    hand-computed per-channel-dequantized conv."""
    import jax.lax as lax

    from cocodet_tpu.compress.quantize import quantize_weights

    rs = np.random.RandomState(3)
    kernel = rs.randn(3, 3, 8, 16).astype(np.float32)
    x = (rs.rand(2, 10, 10, 8).astype(np.float32) * 20 - 10) \
        * rs.rand(8).astype(np.float32)  # distinct per-channel ranges
    a_scale = np.maximum(np.abs(x).max(axis=(0, 1, 2)), 1e-8) / 127.0

    variables = {"params": {"c": {"kernel": jnp.asarray(kernel)}}}
    qtree = {"c": {"act_scale": jnp.asarray(a_scale)}}
    qvars, quant = quantize_weights(variables, qtree)
    qk = np.asarray(qvars["params"]["c"]["kernel"])
    w_scale = np.asarray(quant["c"]["w_scale"])
    assert qk.dtype == np.int8

    xq = np.clip(np.round(x / a_scale), -127, 127).astype(np.int8)
    got = np.asarray(lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(qk),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)).astype(np.float32) * w_scale

    # reference: dequantize explicitly (scaled kernel / w_scale rounding)
    k_deq = np.round(kernel * a_scale[None, None, :, None]
                     / w_scale).clip(-127, 127) * w_scale
    x_deq = xq.astype(np.float32)
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x_deq), jnp.asarray(k_deq),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_per_channel_grouped_falls_back():
    """Grouped/depthwise conv (kernel cin axis != len(act_scale)) collapses
    to a per-tensor scale instead of mis-folding."""
    from cocodet_tpu.compress.quantize import quantize_weights

    rs = np.random.RandomState(0)
    kernel = rs.randn(3, 3, 1, 8).astype(np.float32)  # depthwise, groups=8
    a_vec = (rs.rand(8).astype(np.float32) + 0.1) / 127.0
    variables = {"params": {"dw": {"kernel": jnp.asarray(kernel)}}}
    qvars, quant = quantize_weights(variables,
                                    {"dw": {"act_scale": jnp.asarray(a_vec)}})
    a_out = np.asarray(quant["dw"]["act_scale"])
    assert a_out.ndim == 0 and np.isclose(a_out, a_vec.max())
    qk = np.asarray(qvars["params"]["dw"]["kernel"])
    # per-tensor fallback: plain per-cout quantization of the raw kernel
    w_scale = np.asarray(quant["dw"]["w_scale"])
    np.testing.assert_array_equal(
        qk, np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8))


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


def test_int4_pack_roundtrip():
    """pack_int4_tree/unpack_int4_tree are a lossless pair on nibble-range
    int8 leaves (odd and even sizes, any rank) and pass everything else
    through untouched."""
    from cocodet_tpu.compress import pack_int4_tree, unpack_int4_tree
    from cocodet_tpu.compress.quantize import tree_has_int4

    rs = np.random.RandomState(3)
    tree = {
        "a": {"kernel": rs.randint(-8, 8, (3, 3, 5, 7)).astype(np.int8)},
        "odd": rs.randint(-8, 8, (11,)).astype(np.int8),
        "w8": rs.randint(-127, 128, (4, 4)).astype(np.int8),  # full-range
        "f": rs.rand(6).astype(np.float32),
    }
    # force a genuinely full-range leaf so it must NOT be packed
    tree["w8"].flat[0] = 127
    packed = pack_int4_tree(tree)
    assert tree_has_int4(packed)
    # nibble leaves got ~2x smaller on the wire
    assert packed["a"]["kernel"]["__int4_packed__"].nbytes \
        == (tree["a"]["kernel"].size + 1) // 2
    # full-range int8 and float leaves untouched
    np.testing.assert_array_equal(packed["w8"], tree["w8"])
    np.testing.assert_array_equal(packed["f"], tree["f"])
    out = unpack_int4_tree(packed)
    assert not tree_has_int4(out)
    for k in ("odd", "w8", "f"):
        np.testing.assert_array_equal(out[k], tree[k])
    np.testing.assert_array_equal(out["a"]["kernel"], tree["a"]["kernel"])
    assert out["a"]["kernel"].dtype == np.int8
    # a tree with no packed nodes passes through unchanged
    np.testing.assert_array_equal(
        unpack_int4_tree(tree)["a"]["kernel"], tree["a"]["kernel"])


def test_int4_pack_declared_paths_and_corruption():
    """ADVICE r3: explicit kernel_paths makes the on-disk format declared
    (a nibble-range w8a8 leaf stays unpacked unless named); declared
    non-nibble leaves are an error; corrupt packed trees fail loudly."""
    import pytest

    from cocodet_tpu.compress import pack_int4_tree, unpack_int4_tree
    from cocodet_tpu.compress.quantize import tree_has_int4

    rs = np.random.RandomState(4)
    tree = {
        "q4": {"kernel": rs.randint(-8, 8, (3, 3, 4, 8)).astype(np.int8)},
        # nibble-range BY ACCIDENT — must stay unpacked when not declared
        "w8_lucky": {"kernel": rs.randint(-3, 4, (2, 2)).astype(np.int8)},
    }
    packed = pack_int4_tree(tree, kernel_paths={("q4", "kernel")})
    assert "__int4_packed__" in packed["q4"]["kernel"]
    np.testing.assert_array_equal(packed["w8_lucky"]["kernel"],
                                  tree["w8_lucky"]["kernel"])
    out = unpack_int4_tree(packed)
    np.testing.assert_array_equal(out["q4"]["kernel"], tree["q4"]["kernel"])

    # declaring a full-range leaf as int4 is an error, not silent damage
    bad = {"k": rs.randint(-127, 128, (8,)).astype(np.int8)}
    bad["k"].flat[0] = 127
    with pytest.raises(ValueError, match="nibble-range"):
        pack_int4_tree(bad, kernel_paths={("k",)})

    # truncated checkpoint: data without its shape sibling
    corrupt = {"q4": {"kernel": {
        "__int4_packed__": packed["q4"]["kernel"]["__int4_packed__"]}}}
    with pytest.raises(ValueError, match="corrupt int4"):
        unpack_int4_tree(corrupt)
    # orphan shape leaf
    corrupt2 = {"q4": {"kernel": {
        "__int4_shape__": packed["q4"]["kernel"]["__int4_shape__"]}}}
    with pytest.raises(ValueError, match="orphan"):
        unpack_int4_tree(corrupt2)
    assert tree_has_int4(packed)


def test_w4a8_forward_close(fused_setup):
    """bits=4 (w4a8): kernels land on the [-7, 7] nibble grid, ride the
    SAME w8a8 runtime graph, and stay reasonably close to the float model
    (coarser grid -> looser tolerance than the w8a8 test)."""
    variables, imgs = fused_setup
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")
    qvars = quantize_model(calib, variables, [imgs], per_channel_act=True,
                           bits=4)

    from flax.traverse_util import flatten_dict
    kernels = [np.asarray(v) for v in flatten_dict(qvars["params"]).values()
               if v.dtype == jnp.int8]
    assert kernels
    assert all(k.min() >= -7 and k.max() <= 7 for k in kernels)

    rep = quantization_report(qvars, bits=4)
    assert rep["weight_bits"] == 4
    # bits=4 accounting matches pack_int4_tree exactly: ceil(n/2) packed
    # data bytes + the int32 shape-metadata leaf per kernel (ADVICE r3).
    expected = sum((k.size + 1) // 2 + 4 * k.ndim for k in kernels)
    assert rep["int8_bytes"] == expected
    # the report is self-describing (per-conv w_bits leaves in the quant
    # tree override the caller default), so even the default-bits call
    # returns nibble accounting — and it must be ~half the int8 footprint
    assert quantization_report(qvars)["int8_bytes"] == expected
    assert expected < 0.55 * sum(k.size for k in kernels) + 4 * sum(
        k.ndim for k in kernels)

    ref = _flat_outputs(fused, variables, imgs)
    got = _flat_outputs(q, qvars, imgs)
    err = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert err.max() / scale < 0.5, err.max() / scale
    assert np.percentile(err, 99) / scale < 0.15


def test_int4_clip_search_beats_absmax():
    """_mse_clip_scales must never be worse than absmax scaling and must
    win clearly on heavy-tailed kernels (the measured int4 failure mode:
    absmax w4a8 scored AP50 0.6097 vs bf16 0.7895 on the r5 chain)."""
    from cocodet_tpu.compress.quantize import _mse_clip_scales

    rs = np.random.RandomState(3)
    kernel = rs.normal(0, 0.05, size=(3, 3, 16, 8)).astype(np.float32)
    kernel[0, 0, 0, :4] = 1.0  # outlier tail in the first 4 out-channels
    absmax = np.abs(kernel).max(axis=(0, 1, 2))
    qmax = 7

    def mse(scale):
        flat = kernel.reshape(-1, kernel.shape[-1])
        q = np.clip(np.round(flat / scale), -qmax, qmax)
        return ((flat - q * scale) ** 2).sum(axis=0)

    s_abs = np.maximum(absmax, 1e-8) / qmax
    s_clip = _mse_clip_scales(kernel, absmax, qmax)
    assert (mse(s_clip) <= mse(s_abs) + 1e-12).all()
    # outlier channels must clip (scale strictly below absmax/qmax)
    assert (s_clip[:4] < s_abs[:4] * 0.999).all()
    # the outlier's own clipping error bounds the win — the reliable
    # property is "never worse, measurably better on the tail channels"
    assert (mse(s_clip)[:4] < 0.95 * mse(s_abs)[:4]).all()
    assert mse(s_clip)[:4].sum() < 0.9 * mse(s_abs)[:4].sum()


def test_w8a8_default_stays_absmax(fused_setup):
    """bits=8 keeps plain absmax scaling by default (clip_search off) so
    the established w8a8 production artifacts stay bit-identical."""
    variables, imgs = fused_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    qvars = quantize_model(calib, variables, [imgs], per_channel_act=True)

    from flax.traverse_util import flatten_dict
    qflat = flatten_dict(qvars["quant"])
    pflat = flatten_dict(qvars["params"])
    vflat = flatten_dict(variables["params"])
    checked = 0
    for path, w_scale in qflat.items():
        if path[-1] != "w_scale":
            continue
        kpath = path[:-1] + ("kernel",)
        kernel = np.asarray(vflat[kpath], np.float32)
        a_scale = np.asarray(qflat[path[:-1] + ("act_scale",)], np.float32)
        if a_scale.ndim and kernel.shape[2] == a_scale.shape[0]:
            kernel = kernel * a_scale[None, None, :, None]
        absmax = np.abs(kernel).max(axis=(0, 1, 2))
        np.testing.assert_allclose(np.asarray(w_scale),
                                   np.maximum(absmax, 1e-8) / 127.0,
                                   rtol=1e-6)
        assert pflat[kpath].dtype == jnp.int8
        checked += 1
    assert checked > 10


def test_w4a8_mixed_precision_keep(fused_setup):
    """bits=4 + w8_keep_patterns: heads/stems stay on the int8 grid (the
    low-bit-sensitive layers), the backbone bulk goes nibble; per-conv
    w_bits leaves declare the split and the report accounts it exactly."""
    variables, imgs = fused_setup
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    q = build_model("yolox-p6", depth=D, width=W, fused=True, quant="w8a8")
    keep = ("head/", "stem")
    qvars = quantize_model(calib, variables, [imgs], per_channel_act=True,
                           bits=4, w8_keep_patterns=keep)

    from flax.traverse_util import flatten_dict
    qflat = flatten_dict(qvars["quant"])
    bits_by_path = {p[:-1]: int(v) for p, v in qflat.items()
                    if p[-1] == "w_bits"}
    assert bits_by_path
    n8 = n4 = 0
    for scope, b in bits_by_path.items():
        name = "/".join(scope + ("kernel",))
        expect = 8 if any(pat in name for pat in keep) else 4
        assert b == expect, (name, b)
        n8 += b == 8
        n4 += b == 4
    assert n8 > 0 and n4 > 0

    # exact mixed accounting: nibble bytes for w_bits==4, full for ==8
    pflat = flatten_dict(qvars["params"])
    expected = 0
    for scope, b in bits_by_path.items():
        k = pflat[scope + ("kernel",)]
        expected += ((k.size + 1) // 2 + 4 * k.ndim) if b == 4 else k.size
    rep = quantization_report(qvars, bits=4)
    assert rep["int8_bytes"] == expected

    # mixed must track the float model at least as well as pure w4
    qvars4 = quantize_model(calib, variables, [imgs], per_channel_act=True,
                            bits=4)
    ref = _flat_outputs(fused, variables, imgs)
    err_mixed = np.abs(_flat_outputs(q, qvars, imgs) - ref)
    err_pure = np.abs(_flat_outputs(q, qvars4, imgs) - ref)
    assert np.percentile(err_mixed, 99) <= np.percentile(err_pure, 99) * 1.05


def test_w4a8_checkpoint_roundtrip(fused_setup, tmp_path):
    """The packed w4a8 msgpack is ~2x smaller than the unpacked one and
    load_checkpoint restores bit-identical int8 params transparently."""
    from flax import serialization
    from flax.traverse_util import flatten_dict

    from cocodet_tpu.compress import pack_int4_tree
    from cocodet_tpu.utils.checkpoint import load_checkpoint

    variables, imgs = fused_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    qvars = quantize_model(calib, variables, [imgs], bits=4)
    params = jax.tree_util.tree_map(np.asarray, qvars["params"])

    plain = serialization.msgpack_serialize(
        serialization.to_state_dict({"params": params}))
    packed_state = serialization.to_state_dict(
        {"params": pack_int4_tree(params)})
    packed = serialization.msgpack_serialize(packed_state)
    int8_total = sum(v.size for v in flatten_dict(params).values()
                     if v.dtype == np.int8)
    assert len(plain) - len(packed) > int8_total // 3  # real storage win

    p = tmp_path / "w4a8_ckpt.msgpack"
    p.write_bytes(packed)
    loaded = load_checkpoint(str(p))
    got = flatten_dict(loaded["params"])
    for k, v in flatten_dict(params).items():
        np.testing.assert_array_equal(np.asarray(got[k]), v, err_msg=str(k))
        assert np.asarray(got[k]).dtype == v.dtype
