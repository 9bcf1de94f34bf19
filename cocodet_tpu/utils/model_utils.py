"""Model introspection: param counts, FLOPs, module summaries.

Parity target: ref yolox/utils/model_utils.py — get_model_info (thop
params/GFLOPs, :21-29), fuse_conv_and_bn/fuse_model (:32-75 — implemented
as the pure transform in cocodet_tpu/ops/fuse.py), replace_module /
replace_conv (:110-128 — moot in flax: variants are module attributes,
see models.blocks ConvBnAct use_mask/weight_mask).

FLOPs come from XLA's own cost analysis of the compiled forward — exact for
the program that actually runs, unlike thop's per-module estimate.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def count_params(tree) -> int:
    import jax

    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(tree))


def get_model_info(model, variables, input_size: Tuple[int, int] = (640, 640)
                   ) -> str:
    """"Params: X.XXM, Gflops: Y.YY" — ref model_utils.py:21-29 format."""
    import jax
    import jax.numpy as jnp

    n_params = count_params(variables.get("params", variables))
    x = jnp.zeros((1, input_size[0], input_size[1], 3), jnp.float32)
    flops = None
    try:
        compiled = jax.jit(lambda v, xx: model.apply(v, xx)).lower(
            variables, x).compile()
        cost = compiled.cost_analysis()
        if cost:
            flops = cost.get("flops")
    except Exception:
        pass
    gflops = f"{flops / 1e9:.2f}" if flops else "n/a"
    return f"Params: {n_params / 1e6:.2f}M, Gflops: {gflops}"


def tree_summary(variables, max_rows: int = 0) -> str:
    """Per-top-level-scope param counts."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(variables.get("params", variables))
    by_scope: Dict[str, int] = {}
    for path, v in flat.items():
        scope = "/".join(path[:2])
        by_scope[scope] = by_scope.get(scope, 0) + int(np.prod(np.shape(v)))
    rows = sorted(by_scope.items(), key=lambda kv: -kv[1])
    if max_rows:
        rows = rows[:max_rows]
    width = max(len(k) for k, _ in rows) if rows else 10
    return "\n".join(f"{k:{width}s} {v:>12,d}" for k, v in rows)
