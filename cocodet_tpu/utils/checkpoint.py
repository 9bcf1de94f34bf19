"""Checkpoint save/load for train state and deployment params.

Parity target: ref yolox/utils/checkpoint.py (shape-checked partial load,
best_ckpt copy) and trainer.py:345-359 checkpoint dict
{start_epoch, model, optimizer}.

Format: msgpack via flax.serialization inside a single file — host-agnostic,
no torch dependency. Orbax is available for sharded multi-host checkpoints
(cocodet_tpu/parallel), but single-file msgpack keeps the deployment
artifacts (fused / pruned param trees) trivially portable, standing in for
the reference's .pth zoo (merge_save*.py outputs).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

from .logger import logger


def save_checkpoint(state: Dict[str, Any], is_best: bool, save_dir: str,
                    model_name: str = "latest") -> str:
    """Write ``<name>_ckpt.msgpack`` (+ best copy) — ref checkpoint.py:28-35."""
    os.makedirs(save_dir, exist_ok=True)
    state = serialization.to_state_dict(state)  # FrozenDict -> plain dict
    state = jax.tree_util.tree_map(np.asarray, state)
    path = os.path.join(save_dir, f"{model_name}_ckpt.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir, "best_ckpt.msgpack"))
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    # w4a8 checkpoints (tools/quantize_model.py --bits 4) store nibble-
    # packed kernels (compress/quantize.py pack_int4_tree); unpack
    # transparently so every consumer sees plain int8 params.
    from ..compress.quantize import tree_has_int4, unpack_int4_tree
    if isinstance(tree, dict) and tree_has_int4(tree):
        tree = unpack_int4_tree(tree)
    return tree


def load_matched(target: Any, ckpt: Any) -> Any:
    """Shape-checked partial load (ref checkpoint.py:11-25): keys present in
    both trees with matching shapes are taken from the checkpoint; mismatches
    are kept from ``target`` with a warning."""
    t_flat = flatten_dict(target)
    c_flat = flatten_dict(ckpt)
    out = {}
    for k, v in t_flat.items():
        c = c_flat.get(k)
        if c is None:
            logger.warning("ckpt missing %s; keeping init", "/".join(map(str, k)))
            out[k] = v
        elif tuple(np.shape(c)) != tuple(np.shape(v)):
            logger.warning(
                "shape mismatch for %s: ckpt %s vs model %s; keeping init",
                "/".join(map(str, k)), np.shape(c), np.shape(v))
            out[k] = v
        elif np.asarray(c).dtype == np.int8:
            # int8 PTQ kernels (compress/quantize.py): the w8a8 model inits
            # float kernels, but the quantized dtype must survive the load
            out[k] = jax.numpy.asarray(c)
        else:
            out[k] = jax.numpy.asarray(c, dtype=np.asarray(v).dtype) if hasattr(v, "dtype") else c
    return unflatten_dict(out)
