"""BN folding, magnitude masking, merge chain, and distillation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodet_tpu.compress import (count_effective_params,
                                  generate_magnitude_masks, inject_masks,
                                  merge_for_deployment)
from cocodet_tpu.models import ConvBnAct, build_model
from cocodet_tpu.models.distill import distill_loss_pair, distiller_loss
from cocodet_tpu.ops.fuse import fuse_batchnorm

W, D = 0.25, 0.33


def _randomized_convbn(rng):
    m = ConvBnAct(8, 3, act="silu")
    x = jax.random.normal(rng, (2, 8, 8, 4))
    vars_ = m.init(rng, x)
    # randomize BN stats so fusion is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(rng, a.shape, minval=0.1,
                                         maxval=0.5),
        vars_["batch_stats"])
    params = jax.tree_util.tree_map(
        lambda a: a + jax.random.uniform(rng, a.shape, minval=-0.3,
                                         maxval=0.3), vars_["params"])
    return m, {"params": params, "batch_stats": stats}, x


def test_fuse_convbn_numeric():
    rng = jax.random.PRNGKey(0)
    m, vars_, x = _randomized_convbn(rng)
    ref = m.apply(vars_, x)
    fused_vars = fuse_batchnorm(vars_, eps=1e-3)
    fused_model = ConvBnAct(8, 3, act="silu", fused=True)
    got = fused_model.apply(fused_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model_vars():
    model = build_model("yolox-p6", depth=D, width=W)
    x = jnp.zeros((1, 64, 64, 3))
    return model, model.init(jax.random.PRNGKey(0), x), x


def test_fuse_full_model(tiny_model_vars):
    model, vars_, x = tiny_model_vars
    # randomize stats for a meaningful check
    vars_ = dict(vars_)
    vars_["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.1, vars_["batch_stats"])
    xin = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    ref = model.apply(vars_, xin)

    fused_vars = fuse_batchnorm(vars_, eps=1e-3)
    fused_model = build_model("yolox-p6", depth=D, width=W, fused=True)
    got = fused_model.apply(fused_vars, xin)
    for r, g in zip(ref, got):
        for k in ("reg", "obj", "cls"):
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(r[k]),
                                       rtol=1e-4, atol=1e-4)


def test_magnitude_mask_chain(tiny_model_vars):
    model, vars_, x = tiny_model_vars
    masks = generate_magnitude_masks(vars_["params"], prune_ratio=0.49,
                                     verbose=False)
    leaves = jax.tree_util.tree_leaves(masks)
    total = sum(int(np.prod(m.shape)) for m in leaves)
    kept = sum(int(np.asarray(m).sum()) for m in leaves)
    assert abs(kept / total - 0.51) < 0.01  # 49% pruned

    v2 = inject_masks(dict(vars_), masks)
    eff, tot = count_effective_params(v2, v2["masks"])
    assert eff < tot

    # masked forward works and differs from dense
    masked_model = build_model("yolox-p6", depth=D, width=W,
                               weight_mask=True)
    xin = jnp.ones((1, 64, 64, 3)) * 100.0
    out_masked = masked_model.apply(v2, xin)
    out_dense = model.apply(vars_, xin)
    assert not np.allclose(np.asarray(out_masked[0]["reg"]),
                           np.asarray(out_dense[0]["reg"]))


def test_merge_matches_masked_forward(tiny_model_vars):
    """merge (BN-fold + mask fold) == masked unfused model, numerically."""
    model, vars_, _ = tiny_model_vars
    masks = generate_magnitude_masks(vars_["params"], prune_ratio=0.3,
                                     verbose=False)
    v2 = inject_masks(dict(vars_), masks)
    masked_model = build_model("yolox-p6", depth=D, width=W,
                               weight_mask=True)
    xin = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 255

    ref = masked_model.apply(v2, xin)
    merged = merge_for_deployment(v2, eps=1e-3)
    fused_model = build_model("yolox-p6", depth=D, width=W, fused=True)
    got = fused_model.apply(merged, xin)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g["cls"]),
                                   np.asarray(r["cls"]), rtol=1e-4,
                                   atol=1e-4)


def test_distill_loss_basic():
    rng = jax.random.PRNGKey(0)
    s = jax.random.normal(rng, (2, 8, 8, 16))
    total, at, am = distill_loss_pair(s, s)
    # identical maps: at = 0; am = 0
    assert float(at) == pytest.approx(0.0, abs=1e-6)
    assert float(am) == pytest.approx(0.0, abs=1e-5)
    t = s + 0.5
    total2, _, _ = distill_loss_pair(s, t)
    assert float(total2) > 0

    # gradient flows to student only
    g = jax.grad(lambda s_: distill_loss_pair(s_, t)[0])(s)
    assert float(jnp.abs(g).sum()) > 0


def test_distiller_taps(tiny_model_vars):
    model, vars_, x = tiny_model_vars
    _, taps = model.apply(vars_, x, return_taps=True)
    losses = distiller_loss(taps, jax.tree_util.tree_map(
        lambda a: a + 0.1, taps))
    assert float(losses["dis_loss"]) > 0
    assert float(losses["dis_backbone_loss"]) > 0
    assert float(losses["dis_fpn_loss"]) > 0
