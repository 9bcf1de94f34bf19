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

The default mesh is 1-D ("data") because the model is a 25M-param CNN
(SURVEY.md §2.6: DP is the only strategy the reference has).  Beyond the
reference, make_mesh_2d adds a ("data", "space") mesh that additionally
shards image HEIGHT — activation-memory scale-out for training (GSPMD conv
halos; Trainer wires it via exp.spatial_devices) mirroring the harness's
spatial_partition serving mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


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


def make_mesh_2d(n_space: int,
                 devices: Optional[Sequence[Any]] = None) -> Mesh:
    """(data, space) mesh: batch sharded over rows, image HEIGHT over
    columns.  The spatial axis is the memory scale-out for training — each
    device holds H/n_space of every activation, so operating points that
    OOM one chip (measured: device-mosaic b128@640/G=120 needs 14.7 GB vs
    the 16 GB v5e, ROADMAP.md) fit on a slice with NO semantic change:
    GSPMD inserts the conv halo exchanges, BN batch stats and the loss
    reduce over the global batch exactly as on the 1-D mesh.  Serving-side
    counterpart: harness spatial_partition mode (harness/main.py)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_space:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"n_space={n_space}")
    return Mesh(np.array(devices).reshape(-1, n_space),
                (DATA_AXIS, SPACE_AXIS))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS
                  ) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batches: batch over "data", height over "space" when the
    mesh has a spatial axis (make_mesh_2d), else batch-only."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding_fn(mesh: Mesh):
    """Per-array sharding chooser for mixed batches on a 2-D mesh.

    Height-shard only leaves that actually look like NHWC images: rank 4,
    a 1- or 3-wide channel axis last, and a height evenly divisible over
    the space axis.  Everything else (labels, per-tile box tensors like
    the device-mosaic dict's (B, 5, L, 4) boxes5, rng vectors) shards
    batch-only — device_put rejects uneven shardings, and non-image rank-4
    leaves are exactly the trap."""
    n_space = dict(getattr(mesh, "shape", {})).get(SPACE_AXIS, 1)

    def choose(x) -> NamedSharding:
        if (np.ndim(x) == 4 and n_space > 1
                and np.shape(x)[-1] in (1, 3)
                and np.shape(x)[1] % n_space == 0):
            return image_sharding(mesh)
        return data_sharding(mesh, np.ndim(x))
    return choose


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with batch-dim (+ height on a 2-D mesh)
    sharding."""
    choose = batch_sharding_fn(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, choose(x)), batch)


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
