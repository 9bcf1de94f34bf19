"""Conv-BN folding as a pure param-pytree transform.

Parity target: ref yolox/utils/model_utils.py:32-75 (fuse_conv_and_bn /
fuse_model): W' = diag(gamma/sqrt(var+eps)) @ W, b' = beta - gamma*mean/sqrt(var+eps)
(+ folded conv bias if present).

The reference mutates nn.Modules in place; here fusion maps the variables of
a model built with ``fused=False`` onto the param tree of the same model
built with ``fused=True`` — a pure function, trivially testable for numeric
equivalence (see tests/test_fuse.py).

Tree layout contract (see blocks.ConvBnAct): every fusable pair lives under
``.../<name>/conv/{kernel}`` + ``.../<name>/bn/{scale,bias}`` with
batch_stats ``.../<name>/bn/{mean,var}``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from flax.core import unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


def fuse_batchnorm(variables: Dict[str, Any], eps: float = 1e-3) -> Dict[str, Any]:
    """Fold every conv+bn pair into conv kernel+bias.

    Input: {"params": ..., "batch_stats": ...} of an unfused model.
    Output: {"params": ...} for the same architecture with fused=True.
    ChannelMask gates (``masks`` collection), if present, are folded in too:
    scale multiplies the output channel, offset*(1-scale) adds to the bias
    (exactly the ChannelMask algebra, ref network_blocks.py:34-41).
    """
    params = flatten_dict(unfreeze(variables["params"]))
    stats = flatten_dict(unfreeze(variables.get("batch_stats", {})))
    masks = flatten_dict(unfreeze(variables.get("masks", {})))

    fused: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for path, kernel in params.items():
        if path[-2:] == ("conv", "kernel"):
            scope = path[:-2]
            bn_scale = params.get(scope + ("bn", "scale"))
            if bn_scale is None:
                # head prediction convs (already bias-carrying, no bn)
                fused[path] = kernel
                bias = params.get(scope + ("conv", "bias"))
                if bias is not None:
                    fused[scope + ("conv", "bias")] = bias
                continue
            bn_bias = params[scope + ("bn", "bias")]
            mean = stats[scope + ("bn", "mean")]
            var = stats[scope + ("bn", "var")]
            inv_std = jax.lax.rsqrt(var + eps)
            w = kernel * (bn_scale * inv_std)[None, None, None, :]
            b = bn_bias - bn_scale * mean * inv_std
            conv_bias = params.get(scope + ("conv", "bias"))
            if conv_bias is not None:
                b = b + bn_scale * inv_std * conv_bias

            # fold a SynFlow elementwise kernel mask if present
            wmask = masks.get(scope + ("conv", "conv_mask"))
            if wmask is not None:
                w = w * wmask

            # fold a ChannelMask gate if present:
            # y = z*s + o*(1-s)  with z = conv_bn(x)
            cscale = masks.get(scope + ("mask", "scale"))
            if cscale is not None:
                coffset = masks[scope + ("mask", "offset")]
                w = w * cscale[None, None, None, :]
                b = b * cscale + coffset * (1.0 - cscale)

            fused[path] = w
            fused[scope + ("conv", "bias")] = b
        elif path[-2] == "bn":
            continue
        else:
            fused[path] = kernel

    return {"params": unflatten_dict(fused)}


def fold_focus_stem(params: Dict[str, Any],
                    order: str = "pixel_unshuffle") -> Dict[str, Any]:
    """Rewrite a fused deployment tree's Focus stem into the equivalent
    6x6 stride-2 conv (build the model with ``stem6=True`` to consume it).

    Math: Focus computes conv3x3(space_to_depth(x)).  With xd the
    half-res 4c-channel tensor, xd[p, q, ch(i, j, cc)] = x[2p+i, 2q+j, cc]
    (row offset i, col offset j — channel packing per ``order``, see
    blocks.space_to_depth), so

        y[p, q, o] = sum_{u,v,i,j,cc} k3[u, v, ch(i,j,cc), o]
                                      * x[2(p+u-1)+i, 2(q+v-1)+j, cc]

    which is a stride-2 conv with a 6x6 kernel indexed r = 2u+i, s = 2v+j
    and symmetric zero-padding of 2 — exactly what Conv2d(kernel_size=6,
    stride=2) applies ((k-1)//2 = 2), since the Focus 3x3 conv zero-pads
    the half-res image by 1.  The rewrite is a pure permutation of kernel
    entries: exact in every dtype, including int8 w8a8 kernels (the
    per-out-channel scales and the input act_scale are unaffected).

    Ref context: Focus slice-concat ref network_blocks.py:333-346,
    FocusCustom pixel_unshuffle ref network_blocks.py:350-361.  The
    reference never had this rewrite; on TPU it removes the 4 strided HBM
    gathers of space-to-depth from the inference graph.
    """
    flat = flatten_dict(unfreeze(params))
    # YOLOX -> PAFPN "backbone" -> CSPBackbone "backbone" -> Focus "stem"
    stem = ("backbone", "backbone", "stem")
    kpath = stem + ("conv", "conv", "kernel")
    bpath = stem + ("conv", "conv", "bias")
    assert kpath in flat, "params has no fused Focus stem (backbone/backbone/stem/conv/conv)"
    k3 = flat.pop(kpath)
    kh, kw_, c4, w = k3.shape
    assert (kh, kw_) == (3, 3) and c4 % 4 == 0, k3.shape
    c = c4 // 4
    if order == "pixel_unshuffle":
        # ch = cc*4 + i*2 + j -> (u, v, cc, i, j, o)
        t = k3.reshape(3, 3, c, 2, 2, w)
        k6 = t.transpose(0, 3, 1, 4, 2, 5).reshape(6, 6, c, w)
    elif order == "slice_cat":
        # ch = (j*2 + i)*c + cc -> (u, v, j, i, cc, o)
        t = k3.reshape(3, 3, 2, 2, c, w)
        k6 = t.transpose(0, 3, 1, 2, 4, 5).reshape(6, 6, c, w)
    else:
        raise ValueError(order)
    flat[stem + ("conv", "kernel")] = k6
    bias = flat.pop(bpath, None)
    if bias is not None:
        flat[stem + ("conv", "bias")] = bias
    return unflatten_dict(flat)


def fold_focus_quant(quant: Dict[str, Any]) -> Dict[str, Any]:
    """Re-home the stem's quant scales for a fold_focus_stem'd tree: the
    scales themselves are unchanged (same input values, same per-out-channel
    kernels), only the module path shortens by the Focus wrapper level."""
    flat = flatten_dict(unfreeze(quant))
    out = {}
    for path, v in flat.items():
        if path[:5] == ("backbone", "backbone", "stem", "conv", "conv"):
            path = path[:4] + path[5:]
        out[path] = v
    return unflatten_dict(out)


def bn_stats_allreduce(batch_stats: Dict[str, Any], axis_name: str):
    """Cross-replica mean of BN running stats.

    TPU-native replacement for ref yolox/utils/allreduce_norm.py:58-106
    (flatten-all-stats + dist.all_reduce before eval): a single tree_map of
    lax.pmean over the data axis, called inside a shard_map/pmap context.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), batch_stats)
