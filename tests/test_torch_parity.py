"""Numerical parity vs the PyTorch reference (used as a test oracle only).

Builds the reference YOLOXCustomP6 model (ref yolox/models/yolox_p6.py),
copies its randomly-initialized weights into this framework via
utils.torch_import.convert_state_dict, and compares eval-mode forward
outputs elementwise. This validates the entire backbone/neck/head wiring,
BN semantics, padding, activation, and the level-flattening order at once.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_stubs():
    """Stub the reference's unavailable deps (loguru/torchvision/thop)."""
    if "loguru" not in sys.modules:
        m = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        m.logger = _L()
        sys.modules["loguru"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = lambda *a, **k: None
        ops.batched_nms = lambda *a, **k: None
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    if "thop" not in sys.modules:
        th = types.ModuleType("thop")
        th.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = th


@pytest.fixture(scope="module")
def ref_modules():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        from yolox.models.yolo_pafpn_p6 import YOLOPAFPNCustomP6
        from yolox.models.yolo_head_custom import YOLOXHeadCustom
        from yolox.models.yolox_p6 import YOLOXCustomP6
    finally:
        sys.path.remove(REF)
    return YOLOPAFPNCustomP6, YOLOXHeadCustom, YOLOXCustomP6


def _randomize_bn(model, gen):
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.eps = 1e-3  # exp init sets this (ref yolox_p6.py:96-102)
            with torch.no_grad():
                mod.running_mean.uniform_(-0.5, 0.5, generator=gen)
                mod.running_var.uniform_(0.5, 1.5, generator=gen)
                mod.weight.uniform_(0.5, 1.5, generator=gen)
                mod.bias.uniform_(-0.2, 0.2, generator=gen)


def test_p6_forward_parity(ref_modules):
    YOLOPAFPNCustomP6, YOLOXHeadCustom, YOLOXCustomP6 = ref_modules
    depth, width = 0.33, 0.25
    in_channels = [256, 512, 768, 1024]
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    backbone = YOLOPAFPNCustomP6(depth, width, act="hard_swish",
                                 in_channels=in_channels)
    head = YOLOXHeadCustom(80, width, act="hard_swish",
                           strides=(8, 16, 32, 64), in_channels=in_channels)
    ref = YOLOXCustomP6(backbone, head)
    ref.eval()
    _randomize_bn(ref, gen)
    ref.head.decode_in_inference = False

    x = torch.rand(1, 3, 64, 64, generator=gen) * 255.0
    with torch.no_grad():
        ref_out = ref(x).numpy()  # (1, A, 85): raw reg, sigmoid obj/cls

    # ---- import weights into cocodet_tpu ----
    import jax
    import jax.numpy as jnp
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.decode import attach_strides, concat_levels
    from cocodet_tpu.utils.torch_import import convert_state_dict

    variables = convert_state_dict(ref.state_dict(), variant="p6",
                                   num_levels=4)
    model = build_model("yolox-p6", depth=depth, width=width)

    xin = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    outputs = model.apply(dict(variables), xin)
    preds, _, _ = concat_levels(attach_strides(outputs, (8, 16, 32, 64)))
    preds = np.asarray(preds)
    got = np.concatenate(
        [preds[..., :4],
         1.0 / (1.0 + np.exp(-preds[..., 4:]))], axis=-1)

    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-4)


def test_param_tree_complete(ref_modules):
    """Every torch tensor maps to exactly one flax leaf (no silent drops)."""
    YOLOPAFPNCustomP6, YOLOXHeadCustom, YOLOXCustomP6 = ref_modules
    depth, width = 0.33, 0.25
    in_channels = [256, 512, 768, 1024]
    ref = YOLOXCustomP6(
        YOLOPAFPNCustomP6(depth, width, act="hard_swish",
                          in_channels=in_channels),
        YOLOXHeadCustom(80, width, act="hard_swish", strides=(8, 16, 32, 64),
                        in_channels=in_channels))
    from cocodet_tpu.utils.torch_import import convert_state_dict
    import jax

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = convert_state_dict(ref.state_dict(), variant="p6",
                                   num_levels=4)
    n_torch = len(sd)
    n_flax = sum(1 for _ in jax.tree_util.tree_leaves(variables))
    assert n_torch == n_flax, (n_torch, n_flax)


def test_export_state_dict_roundtrip(ref_modules):
    """export_state_dict is the exact inverse of convert_state_dict: every
    reference tensor survives torch -> flax -> torch bit-for-bit (the
    portable .pth export path, tools/export_torch.py)."""
    from cocodet_tpu.utils.torch_import import (convert_state_dict,
                                                export_state_dict)

    YOLOPAFPNCustomP6, YOLOXHeadCustom, YOLOXCustomP6 = ref_modules
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(7)
    backbone = YOLOPAFPNCustomP6(0.33, 0.25, act="hard_swish",
                                 in_channels=[256, 512, 768, 1024])
    head = YOLOXHeadCustom(80, 0.25, in_channels=[256, 512, 768, 1024],
                           act="hard_swish")
    model = torch.nn.Module()
    model.backbone = backbone
    model.head = head
    _randomize_bn(model, gen)

    sd = {k: v for k, v in model.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = convert_state_dict(sd, variant="p6", num_levels=4)
    back = export_state_dict(variables, variant="p6", num_levels=4)

    assert set(back) == set(sd), (set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(back[k].numpy(), sd[k].numpy(), err_msg=k)
