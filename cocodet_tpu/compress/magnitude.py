"""Offline magnitude pruning chain — steps 01 and 02 of the reference.

Parity targets:
  - 01_mask_generator.py:10-46: flatten all 4-D conv kernels EXCLUDING the
    head, global abs-magnitude sort, threshold at the target percentile
    (49%% in the competition artifact), per-layer nnz report + the sparse
    break-even check nnz*5 < total;
  - 02_direct_pruning.py:10-32: inject the boolean masks into the
    checkpoint under conv_mask keys.

Here both are pure pytree transforms: masks live in the ``masks`` collection
(conv_mask leaves) exactly where the SynFlow runtime puts them, so one
deployment path (ops.fuse + compress.merge) serves every pruning flavor.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from ..utils.logger import logger


def generate_magnitude_masks(params: Dict, prune_ratio: float = 0.49,
                             exclude_scopes: Tuple[str, ...] = ("head",),
                             verbose: bool = True) -> Dict:
    """Global magnitude masks over conv kernels outside ``exclude_scopes``.

    Returns a ``masks`` collection pytree with conv_mask leaves
    (1.0 = kept). Mirrors 01_mask_generator.py: only 4-D kernels, global
    threshold at the prune_ratio percentile of |w|.
    """
    flat = flatten_dict(params)
    eligible = {
        path: np.asarray(w)
        for path, w in flat.items()
        if path[-1] == "kernel" and np.ndim(w) == 4
        and not any(s in path for s in exclude_scopes)
    }
    all_w = np.concatenate([np.abs(w).ravel() for w in eligible.values()])
    k = int(round(all_w.size * prune_ratio))
    thresh = np.partition(all_w, k)[k] if 0 < k < all_w.size else -np.inf

    masks = {}
    total_kept = total = 0
    for path, w in eligible.items():
        m = (np.abs(w) > thresh).astype(np.float32)
        masks[path[:-1] + ("conv_mask",)] = m
        nnz, n = int(m.sum()), m.size
        total_kept += nnz
        total += n
        if verbose:
            # sparse-COO break-even check (ref 01_mask_generator.py:40-44)
            useful = "useful" if nnz * 5 < n else "NOT worth sparse storage"
            logger.info("%-60s nnz %d/%d (%.1f%%) [%s]",
                        "/".join(path[:-1]), nnz, n, 100 * nnz / n, useful)
    logger.info("global: kept %d/%d (%.2f%%) at threshold %.3e",
                total_kept, total, 100 * total_kept / max(total, 1), thresh)
    return unflatten_dict(masks)


def inject_masks(variables: Dict, masks: Dict) -> Dict:
    """Step 02: attach the mask collection to a checkpoint's variables."""
    out = dict(variables)
    existing = flatten_dict(out.get("masks", {}))
    existing.update(flatten_dict(masks))
    out["masks"] = unflatten_dict(existing)
    return out


def sparsity_report(variables: Dict) -> Dict[str, Tuple[int, int]]:
    """Param-count accounting (ref check_param.py / main.py:16-28):
    (effective nonzero params, total params) per kernel + overall."""
    params = flatten_dict(variables["params"])
    masks = flatten_dict(variables.get("masks", {}))
    report = {}
    for path, w in params.items():
        m = masks.get(path[:-1] + ("conv_mask",))
        n = int(np.prod(np.shape(w)))
        nnz = int(np.asarray(m).sum()) if m is not None else n
        report["/".join(path)] = (nnz, n)
    return report
