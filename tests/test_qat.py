"""QAT (quantization-aware fine-tune) tests: fake-quant STE numerics, the
QAT-sim vs deployed-w8a8 forward equivalence, and loss descent of the QAT
step on the fused topology (compress/qat.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cocodet_tpu.compress import (act_scale_tree, calibrate, build_quant_tree,
                                  make_qat_step, quantize_model, requantize)
from cocodet_tpu.models import build_model
from cocodet_tpu.models.blocks import fake_quant

D, W, S = 0.33, 0.25, 64


def test_fake_quant_grid_and_ste():
    scale = jnp.float32(0.5)
    v = jnp.asarray([-100.0, -63.49, -0.26, 0.0, 0.26, 3.3, 100.0])
    q = fake_quant(v, scale)
    # forward: snapped onto scale*[-127,127] grid, identical to the w8a8
    # recipe clip(round(v/s))*s
    want = np.clip(np.round(np.asarray(v) / 0.5), -127, 127) * 0.5
    np.testing.assert_allclose(np.asarray(q), want, atol=1e-6)
    # backward: clipped STE — identity inside the representable range,
    # zero outside
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, scale)))(v)
    np.testing.assert_allclose(np.asarray(g),
                               [0, 1, 1, 1, 1, 1, 0], atol=1e-6)


def test_fake_quant_per_channel_broadcast():
    k = np.random.RandomState(0).randn(3, 3, 4, 8).astype(np.float32)
    w_scale = np.abs(k).max(axis=(0, 1, 2)) / 127.0
    q = np.asarray(fake_quant(jnp.asarray(k), jnp.asarray(w_scale)))
    want = np.clip(np.round(k / w_scale), -127, 127) * w_scale
    np.testing.assert_allclose(q, want, atol=1e-6)
    # grid values survive requantization exactly (round-trip fixed point)
    q2 = np.clip(np.round(q / w_scale), -127, 127) * w_scale
    np.testing.assert_allclose(q2, q, atol=1e-7)


@pytest.fixture(scope="module")
def qat_setup():
    fused = build_model("yolox-p6", depth=D, width=W, fused=True)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = dict(fused.init(rng, x0))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, S, S, 3) * 255, jnp.float32)
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    quant = build_quant_tree(calibrate(calib, variables, [imgs]))
    return variables, quant, imgs


def _flat_outputs(model, variables, imgs):
    outs = model.apply(dict(variables), imgs)
    return np.concatenate([np.asarray(o, np.float32).ravel()
                           for level in outs
                           for o in (level["reg"], level["obj"],
                                     level["cls"])])


@pytest.mark.parametrize("per_channel", [False, True],
                         ids=["per_tensor", "per_channel"])
def test_qat_forward_matches_w8a8(qat_setup, per_channel):
    """The QAT fake-quant simulation must compute what the deployed int8
    graph computes: requantize the (untouched) float params and compare the
    qat-model forward against the w8a8-model forward.  per_channel=True is
    the round-4 production grid (the vector folds into the kernel before
    per-cout quantization — blocks.py simulates exactly that fold)."""
    variables, _, imgs = qat_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    quant = build_quant_tree(calibrate(calib, variables, [imgs]),
                             per_channel_act=per_channel)
    if per_channel:
        from flax.traverse_util import flatten_dict
        assert any(getattr(v, "ndim", 0)
                   for p, v in flatten_dict(quant).items()
                   if p[-1] == "act_scale"), "no vector scales calibrated"
    qat_m = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="qat")
    sim = _flat_outputs(qat_m, {"params": variables["params"],
                                "quant": quant}, imgs)

    int8_params, quant_full = requantize(variables["params"], quant)
    w8a8 = build_model("yolox-p6", depth=D, width=W, fused=True,
                       quant="w8a8")
    dep = _flat_outputs(w8a8, {"params": int8_params,
                               "quant": quant_full}, imgs)
    # only float accumulation order differs (f32 conv of grid values vs
    # exact s8xs8->s32 + rescale)
    scale = np.abs(dep).max()
    assert np.abs(sim - dep).max() / scale < 5e-3


def test_qat_step_descends(qat_setup):
    variables, quant, imgs = qat_setup
    qat_m = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="qat")
    labels = jnp.tile(
        jnp.asarray([[[1.0, 32.0, 32.0, 16.0, 16.0]] + [[0.0] * 5] * 4]),
        (2, 1, 1))
    tx = optax.sgd(1e-4, momentum=0.9, nesterov=True)
    params = variables["params"]
    opt_state = tx.init(params)
    step = make_qat_step(qat_m, tx, strides=(8, 16, 32, 64),
                         num_classes=80, ema_decay=0.9, donate=False)
    from cocodet_tpu.utils.ema import EMAState, ema_init

    ema = ema_init(params)
    ema = EMAState(shadow=ema.shadow, updates=jnp.asarray(50_000, jnp.int32))
    p0 = jax.tree_util.tree_leaves(params)[0].copy()
    losses = []
    for _ in range(5):
        params, opt_state, ema, metrics = step(params, opt_state, ema,
                                               quant, imgs, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the EMA shadow lags the raw iterate: after 5 steps at decay=0.9 it
    # sits between the init and the live params, closer to the live ones
    s0 = jax.tree_util.tree_leaves(ema.shadow)[0]
    live0 = jax.tree_util.tree_leaves(params)[0]
    drift = float(np.abs(np.asarray(live0) - np.asarray(p0)).max())
    lag = float(np.abs(np.asarray(s0) - np.asarray(live0)).max())
    assert drift > 0.0 and 0.0 < lag <= drift
    # the act scales are frozen: the step must not have touched them
    flat = jax.tree_util.tree_leaves(act_scale_tree(quant))
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_requantize_report(qat_setup):
    variables, quant, imgs = qat_setup
    int8_params, quant_full = requantize(variables["params"], quant)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(int8_params)
    n_int8 = sum(1 for v in flat.values() if v.dtype == jnp.int8)
    assert n_int8 > 50
    # head prediction convs stay float
    preds = {p: v for p, v in flat.items()
             if any(s.startswith(("cls_pred", "reg_pred", "obj_pred"))
                    for s in p)}
    assert preds and all(v.dtype != jnp.int8 for v in preds.values())


def test_qat_step_descends_per_channel(qat_setup):
    """The QAT step runs on the per-channel production grid (round 4:
    blocks.py quant='qat' folds the act-scale vector exactly like
    quantize_weights, so QAT can now train the deployed numerics)."""
    variables, _, imgs = qat_setup
    calib = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="calib")
    quant = build_quant_tree(calibrate(calib, variables, [imgs]),
                             per_channel_act=True)
    qat_m = build_model("yolox-p6", depth=D, width=W, fused=True,
                        quant="qat")
    labels = jnp.tile(
        jnp.asarray([[[1.0, 32.0, 32.0, 16.0, 16.0]] + [[0.0] * 5] * 4]),
        (2, 1, 1))
    tx = optax.sgd(1e-4, momentum=0.9, nesterov=True)
    params = variables["params"]
    opt_state = tx.init(params)
    step = make_qat_step(qat_m, tx, strides=(8, 16, 32, 64),
                         num_classes=80, ema_decay=0.9, donate=False)
    from cocodet_tpu.utils.ema import EMAState, ema_init

    ema = ema_init(params)
    ema = EMAState(shadow=ema.shadow, updates=jnp.asarray(50_000, jnp.int32))
    losses = []
    for _ in range(3):
        params, opt_state, ema, metrics = step(params, opt_state, ema,
                                               quant, imgs, labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # and the result requantizes onto the deployed format without error
    int8_params, quant_full = requantize(params, quant)
    assert any(v.dtype == jnp.int8
               for v in jax.tree_util.tree_leaves(int8_params))
