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


def bn_stats_allreduce(batch_stats: Dict[str, Any], axis_name: str):
    """Cross-replica mean of BN running stats.

    TPU-native replacement for ref yolox/utils/allreduce_norm.py:58-106
    (flatten-all-stats + dist.all_reduce before eval): a single tree_map of
    lax.pmean over the data axis, called inside a shard_map/pmap context.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), batch_stats)
