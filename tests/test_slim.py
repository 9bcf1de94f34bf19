"""Channel slimming end-to-end: masked model == slimmed narrow model.

The chain under test (SURVEY.md §7 "hard parts" — pruning->dense channel
adaptation): ChannelMask-pruned variables -> BN-fold + mask fold
(merge_for_deployment) -> physical channel removal + width spec
(slim_channels) -> a genuinely narrower model (build_model(slim=spec))
whose outputs match the masked original.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict, unflatten_dict

from cocodet_tpu.compress import merge_for_deployment, slim_channels
from cocodet_tpu.models import build_model

W, D = 0.25, 0.33


def _prune_some_channels(variables, frac=0.4, zero_offset=True, seed=0):
    """Emulate the Pruner: zero a fraction of ChannelMask scales.

    zero_offset=True leaves offsets at 0 (the exact-fold case);
    False sets offsets to the bn bias like Pruner surgery does.
    """
    rs = np.random.RandomState(seed)
    masks = dict(flatten_dict(variables["masks"]))
    params = flatten_dict(variables["params"])
    n_zeroed = 0
    for path in list(masks):
        if path[-2:] != ("mask", "scale"):
            continue
        scale = np.asarray(masks[path]).copy()
        kill = rs.rand(scale.shape[0]) < frac
        if kill.all():
            kill[rs.randint(scale.shape[0])] = False  # keep >=1 channel
        scale[kill] = 0.0
        masks[path] = jnp.asarray(scale)
        if not zero_offset:
            bias = np.asarray(params[path[:-2] + ("bn", "bias")])
            off = np.asarray(masks[path[:-1] + ("offset",)]).copy()
            off[kill] = bias[kill]
            masks[path[:-1] + ("offset",)] = jnp.asarray(off)
        n_zeroed += int(kill.sum())
    out = dict(variables)
    out["masks"] = unflatten_dict(masks)
    return out, n_zeroed


@pytest.fixture(scope="module")
def masked_setup():
    model = build_model("yolox-p6", depth=D, width=W, use_mask=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    # non-trivial BN stats so the fold is meaningful
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.05, variables["batch_stats"])
    return model, variables, x


def n_params(tree):
    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(tree))


def test_slim_exact_when_offsets_zero(masked_setup):
    model, variables, x = masked_setup
    pruned, n_zeroed = _prune_some_channels(dict(variables), zero_offset=True)
    assert n_zeroed > 0
    ref = model.apply(pruned, x)

    merged = merge_for_deployment(pruned, eps=1e-3)
    slimmed, spec = slim_channels(merged, pruned["masks"], act="hard_swish")
    assert spec, "no slim spec produced"
    assert n_params(slimmed) < n_params(merged)

    slim_model = build_model("yolox-p6", depth=D, width=W, fused=True,
                             slim=spec)
    got = slim_model.apply(slimmed, x)
    for r, g in zip(ref, got):
        for k in ("reg", "obj", "cls"):
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(r[k]),
                                       rtol=2e-4, atol=2e-4)


def test_slim_approx_with_offsets(masked_setup):
    """Pruner-style offsets (bn bias): exact except a 1-px conv2 border rim."""
    model, variables, x = masked_setup
    pruned, _ = _prune_some_channels(dict(variables), zero_offset=False,
                                     seed=1)
    ref = model.apply(pruned, x)

    merged = merge_for_deployment(pruned, eps=1e-3)
    slimmed, spec = slim_channels(merged, pruned["masks"], act="hard_swish")
    slim_model = build_model("yolox-p6", depth=D, width=W, fused=True,
                             slim=spec)
    got = slim_model.apply(slimmed, x)
    # interior agreement: compare medians / bulk, allow border-driven tail
    for r, g in zip(ref, got):
        diff = np.abs(np.asarray(g["cls"]) - np.asarray(r["cls"]))
        assert np.median(diff) < 1e-3, float(np.median(diff))


def test_slim_spec_roundtrip(tmp_path, masked_setup):
    import json

    from cocodet_tpu.compress import load_slim_spec

    model, variables, x = masked_setup
    pruned, _ = _prune_some_channels(dict(variables))
    merged = merge_for_deployment(pruned, eps=1e-3)
    _, spec = slim_channels(merged, pruned["masks"])
    p = tmp_path / "spec.json"
    with open(p, "w") as f:
        json.dump(spec, f)
    loaded = load_slim_spec(str(p))
    assert loaded.keys() == spec.keys()
    for k in spec:
        if isinstance(spec[k], int) or k == "head":
            # stem/down/lateral/bu_conv widths and head {name: width}
            assert spec[k] == loaded[k]
        else:
            assert {i: (tuple(v) if isinstance(v, (list, tuple)) else v)
                    for i, v in spec[k].items()} == loaded[k]


def test_head_slim_exact_with_zero_offsets():
    """Head-tower slimming (stems + cls/reg towers -> preds) is bit-exact
    when mask offsets are zero; spec round-trips through build_model."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from cocodet_tpu.compress import merge_for_deployment, slim_channels
    from cocodet_tpu.models import build_model

    masked = build_model("yolox-p6", depth=0.33, width=0.125, use_mask=True)
    variables = dict(masked.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3), jnp.float32)))
    mflat = dict(flatten_dict(variables["masks"]))
    rs = np.random.RandomState(3)
    n_head = 0
    for path in list(mflat):
        if path[-2:] != ("mask", "scale"):
            continue
        scale = np.asarray(mflat[path]).copy()
        kill = rs.rand(scale.shape[0]) < 0.4
        if kill.all():
            kill[0] = False
        scale[kill] = 0.0
        mflat[path] = jnp.asarray(scale)
        if path[0] == "head":
            n_head += 1
    assert n_head >= 20, "head masks missing"
    variables["masks"] = unflatten_dict(mflat)

    merged = merge_for_deployment(variables, eps=1e-3)
    slimmed, spec = slim_channels(merged, variables["masks"], round_to=8)
    assert len(spec.get("head", {})) == n_head
    # stage producers slimmed too (stem/downs/laterals/bu_convs)
    assert isinstance(spec.get("stem"), int)
    assert isinstance(spec.get("dark3_down"), int)
    assert isinstance(spec.get("lateral1"), int)

    full = build_model("yolox-p6", depth=0.33, width=0.125, fused=True)
    slim = build_model("yolox-p6", depth=0.33, width=0.125, fused=True,
                       slim=spec)
    x = jnp.asarray(rs.rand(2, 64, 64, 3) * 255, np.float32)
    ref = full.apply(merged, x)
    got = slim.apply(slimmed, x)
    for r, g in zip(ref, got):
        for key in ("reg", "obj", "cls"):
            np.testing.assert_allclose(np.asarray(r[key]),
                                       np.asarray(g[key]), atol=1e-5)


def test_residual_group_slim_exact():
    """Residual-stream group slimming: tied dead channels at a CSP's conv1
    + every bottleneck conv2 are physically removed; all stream consumers
    are 1x1, so the fold is exact even with bias-carrying offsets."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from cocodet_tpu.compress import merge_for_deployment, slim_channels
    from cocodet_tpu.models import build_model

    masked = build_model("yolox-p6", depth=0.33, width=0.25, use_mask=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 255
    variables = dict(masked.init(jax.random.PRNGKey(0), x))
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda a: a + 0.05, variables["batch_stats"])
    mflat = dict(flatten_dict(variables["masks"]))
    params = flatten_dict(variables["params"])

    # find every residual group (csp conv1 leader + m*/conv2 members) and
    # kill a tied channel set, with Pruner-style bn-bias offsets
    rs = np.random.RandomState(0)
    n_groups = 0
    for path in list(mflat):
        if path[-2:] != ("mask", "scale") or path[-3] != "conv1":
            continue
        csp = path[:-3]
        if csp + ("m0", "conv1", "conv", "kernel") not in params:
            continue  # SPP conv1, not a residual chain
        width = np.asarray(mflat[path]).shape[0]
        kill = rs.rand(width) < 0.5
        kill[0] = False  # keep >= 1 channel
        sites = [csp + ("conv1",)]
        i = 0
        while csp + (f"m{i}", "conv2", "mask", "scale") in mflat:
            sites.append(csp + (f"m{i}", "conv2"))
            i += 1
        assert i >= 1, f"no tied members under {csp}"
        for s in sites:
            scale = np.asarray(mflat[s + ("mask", "scale")]).copy()
            off = np.asarray(mflat[s + ("mask", "offset")]).copy()
            bias = np.asarray(params[s + ("bn", "bias")])
            scale[kill] = 0.0
            off[kill] = bias[kill]
            mflat[s + ("mask", "scale")] = jnp.asarray(scale)
            mflat[s + ("mask", "offset")] = jnp.asarray(off)
        n_groups += 1
    # P6 backbone: dark2/3/4 are residual (dark5/6 are shortcut=False)
    assert n_groups >= 3, "expected residual groups in the residual stages"

    # ALSO kill bottleneck conv1 (hidden-dim) channels with zero offsets:
    # hidden and residual slimming slice orthogonal kernel dims of the
    # same convs and must compose exactly
    n_hidden = 0
    for path in list(mflat):
        if path[-2:] != ("mask", "scale") or path[-3] != "conv1":
            continue
        if not (len(path) >= 4 and path[-4].startswith("m")
                and path[-4][1:].isdigit()):
            continue  # only bottleneck conv1 sites
        scale = np.asarray(mflat[path]).copy()
        kill = rs.rand(scale.shape[0]) < 0.4
        kill[0] = False
        scale[kill] = 0.0
        mflat[path] = jnp.asarray(scale)
        n_hidden += int(kill.sum())
    assert n_hidden > 0
    variables["masks"] = unflatten_dict(mflat)

    ref = masked.apply(variables, x)
    merged = merge_for_deployment(variables, eps=1e-3)
    slimmed, spec = slim_channels(merged, variables["masks"], round_to=1)
    res_pins = [v["res"] for v in spec.values()
                if isinstance(v, dict) and "res" in v]
    assert len(res_pins) == n_groups
    assert n_params(slimmed) < n_params(merged)

    slim_model = build_model("yolox-p6", depth=0.33, width=0.25, fused=True,
                             slim=spec)
    got = slim_model.apply(slimmed, x)
    for r, g in zip(ref, got):
        for k in ("reg", "obj", "cls"):
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(r[k]),
                                       rtol=2e-4, atol=2e-4)
