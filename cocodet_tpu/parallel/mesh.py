"""Device mesh + sharding helpers — the TPU replacement for the reference's
process-group plumbing.

Parity map (SURVEY.md §2.6):
  - launch/DDP/NCCL bootstrap (ref yolox/core/launch.py:38-131,
    trainer.py:194-195)             -> jax.distributed.initialize + a Mesh
  - rank/world helpers (ref yolox/utils/dist.py:82-108)
                                     -> jax.process_index/process_count
  - gradient all-reduce (implicit in DDP) -> jit-compiled psum over the
    "data" axis: the train step computes the loss over the globally-sharded
    batch and XLA inserts the ICI collectives
  - all_reduce_norm (ref allreduce_norm.py:99) -> BN stats either computed
    globally per step (SyncBN via BatchNorm axis_name) or pmean'd before eval
  - gloo pickle gather of detections (ref dist.py:186-265)
                                     -> multihost_utils.process_allgather

The mesh is 1-D ("data") because the model is a 25M-param CNN (SURVEY.md
§2.6: DP is the only strategy the reference has); the helpers accept an
arbitrary axis dict so a second axis (e.g. spatial) can be added without
touching call sites.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bootstrap (replaces ref launch.py process spawning: under
    jax each host runs one process; there is no fork/spawn step)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS
                  ) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def process_allgather_detections(records):
    """Gather python detection records from all hosts (DCN) — replaces the
    reference's pickled-tensor gloo gather (ref dist.py:224-265,
    coco_evaluator.py:126-129). Only rank 0's return value matters."""
    if jax.process_count() == 1:
        return records
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(records), dtype=np.uint8)
    # pad to the max size across hosts, gather, then unpickle each shard
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for buf, size in zip(gathered, sizes.reshape(-1)):
        out.extend(pickle.loads(buf[: int(size)].tobytes()))
    return out


def sync_global_devices(name: str = "barrier"):
    """Cross-host barrier (replaces ref dist.synchronize, dist.py:66-79)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
