"""Step 03: produce the deployment checkpoint (BN-fold + masks + slimming).

Parity target: ref 03_jh_merge.py — (1) BN-fold every conv (fuse_model,
eps 1e-3), (2) multiply kernels by their masks, (3) store. The reference
stores sparse-COO tensors (:66-87) purely as a storage trick and densifies
at load (ref choijhanyangackr/main.py:52-55); on TPU sparse COO has no
compute value (the MXU wants dense tiles), so this build stores the dense
masked tree directly and keeps the reference's param-count accounting.

Channel adaptation (the TPU-specific extra demanded by BASELINE.json):
``slim_channels`` physically removes output channels whose ChannelMask scale
is 0 (Pruner output) — the kernel/bias columns are dropped, and the
constant the dead channel contributed (act(offset)) is folded into the
consumer conv's bias. This gives genuinely narrower dense convs so the MXU
sees full tiles. Exactness note: the constant-fold is exact on the
interior; at SAME-padding borders the padded zeros never carried the
constant, so a 1-pixel rim differs — measured effect on mAP is below eval
noise, and exact mode (keep dead channels as zeros) remains available via
slim=False.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from ..models.blocks import get_activation
from ..ops.fuse import fuse_batchnorm
from ..utils.logger import logger


def merge_for_deployment(variables: Dict, eps: float = 1e-3) -> Dict:
    """BN-fold + fold masks (conv_mask and ChannelMask) into dense fused
    params — the .pth `merged_49` analogue, loadable by harness/main.py."""
    return fuse_batchnorm(variables, eps=eps)


# --------------------------------------------------------------------------
# channel slimming of fused param trees
# --------------------------------------------------------------------------

#: consumer map inside a CSP bottleneck: conv1 output feeds conv2 input.
#: (the only structured-prune site whose consumer is unique and local —
#: exactly where the reference's ChannelMask sits, ref network_blocks.py
#: Bottleneck conv1 prune=True)
def _bottleneck_pairs(flat_params) -> List[Tuple[Tuple, Tuple]]:
    pairs = []
    for path in flat_params:
        if path[-3:] == ("conv1", "conv", "kernel") and any(
                p.startswith("m") and p[1:].isdigit() for p in path):
            scope = path[:-3]
            c2 = scope + ("conv2", "conv", "kernel")
            if c2 in flat_params:
                pairs.append((scope + ("conv1",), scope + ("conv2",)))
    return pairs


def slim_channels(fused_variables: Dict, masks: Dict, act: str = "hard_swish",
                  ) -> Dict:
    """Physically drop ChannelMask-zero output channels of bottleneck conv1
    layers, folding their constant act(offset) into conv2's bias."""
    params = dict(flatten_dict(fused_variables["params"]))
    mflat = flatten_dict(masks)
    act_fn = get_activation(act)

    removed = kept_total = 0
    for c1, c2 in _bottleneck_pairs(params):
        scale = mflat.get(c1 + ("mask", "scale"))
        offset = mflat.get(c1 + ("mask", "offset"))
        if scale is None:
            continue
        scale = np.asarray(scale)
        keep = scale > 0.0
        kept_total += keep.size
        if keep.all():
            continue
        offset = np.asarray(offset)

        w1 = np.asarray(params[c1 + ("conv", "kernel")])
        b1 = np.asarray(params[c1 + ("conv", "bias")])
        w2 = np.asarray(params[c2 + ("conv", "kernel")])
        b2 = np.asarray(params.get(c2 + ("conv", "bias"),
                                   np.zeros(w2.shape[-1], w2.dtype)))

        # constant each dead channel feeds forward: act(offset)
        import jax.numpy as jnp
        const = np.asarray(act_fn(jnp.asarray(offset))) * (~keep)
        # fold into conv2 bias: sum over kernel taps and dead in-channels
        b2 = b2 + np.einsum("hwio,i->o", w2, const)

        params[c1 + ("conv", "kernel")] = w1[..., keep]
        params[c1 + ("conv", "bias")] = b1[keep]
        params[c2 + ("conv", "kernel")] = w2[..., keep, :]
        params[c2 + ("conv", "bias")] = b2
        removed += int((~keep).sum())

    logger.info("slimmed %d/%d bottleneck hidden channels", removed,
                kept_total)
    return {"params": unflatten_dict(params)}


def count_effective_params(variables: Dict, masks: Optional[Dict] = None
                           ) -> Tuple[int, int]:
    """(effective nonzero, total) across the tree — the 25.1M accounting
    (ref main.py:16-28 counts sparse values())."""
    params = flatten_dict(variables["params"])
    mflat = flatten_dict(masks) if masks else {}
    total = eff = 0
    for path, w in params.items():
        n = int(np.prod(np.shape(w)))
        total += n
        m = mflat.get(path[:-1] + ("conv_mask",))
        if m is not None:
            eff += int(np.asarray(m).sum())
        else:
            eff += int(np.count_nonzero(np.asarray(w)))
    return eff, total
