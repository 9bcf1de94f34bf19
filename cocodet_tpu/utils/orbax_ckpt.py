"""Sharded multi-host checkpointing via Orbax.

SURVEY.md §5.4 calls for "Orbax-style sharded checkpoints for train state"
alongside the portable single-file msgpack deployment artifacts
(utils/checkpoint.py). Use this path when training on a pod slice: each host
writes its own shards; restore re-shards onto the current mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from .logger import logger


def save_sharded(state: Any, directory: str, step: int) -> str:
    """Write a sharded checkpoint under directory/step_<N>."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    logger.info("sharded checkpoint written to %s", path)
    return path


def restore_sharded(directory: str, step: Optional[int] = None,
                    template: Any = None) -> Any:
    """Restore; ``template`` (a matching pytree of ShapeDtypeStruct or
    arrays with shardings) drives placement onto the current mesh."""
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(directory)
            if d.startswith("step_"))
        assert steps, f"no checkpoints in {directory}"
        step = steps[-1]
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)
