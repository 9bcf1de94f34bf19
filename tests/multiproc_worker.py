"""Worker script for the 2-process jax.distributed test (run via
subprocess by test_multiprocess.py). Exercises initialize_distributed,
process_allgather_detections and sync_global_devices
(cocodet_tpu/parallel/mesh.py:34-97; ref yolox/utils/dist.py:186-265)."""

import json
import os
import sys


def make_tiny_training(seed=0, batch=8, size=64, name="yolox-p6"):
    """Deterministic tiny model + global batch, shared by the multi-process
    workers and the single-process oracles (test_multiprocess.py).
    name="yolox" (3-scale, max stride 32) keeps the 2-D-mesh test's
    spatial-validity boundary at H>=128 instead of 256 (cheaper compile
    on the 1-core CI host)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cocodet_tpu.core.train_state import (create_train_state,
                                              make_train_step)
    from cocodet_tpu.models import MODEL_SPECS, build_model

    model = build_model(name, depth=0.33, width=0.125)
    tx = optax.sgd(1e-2, momentum=0.9, nesterov=True)
    rng = jax.random.PRNGKey(seed)
    sample = jnp.zeros((1, size, size, 3), jnp.float32)
    state = create_train_state(model, tx, rng, sample)
    step = make_train_step(model, tx, strides=MODEL_SPECS[name].strides,
                           num_classes=80, donate=False)

    rs = np.random.RandomState(seed)
    imgs = (rs.rand(batch, size, size, 3) * 255).astype(np.float32)
    labels = np.zeros((batch, 5, 5), np.float32)
    labels[:, 0] = [1.0, size / 2, size / 2, size / 4, size / 4]
    labels[:, 1] = [7.0, size / 4, size / 4, size / 8, size / 8]
    return state, step, imgs, labels


def checksum(tree):
    import jax
    import jax.numpy as jnp

    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float64)))
                     for x in jax.tree_util.tree_leaves(tree)))


def train_mode(coordinator, num, pid, devices_per_proc=None):
    """One DP train step under jax.distributed: num procs x (8/num)
    virtual CPU devices = the same 8-device global mesh the
    single-process tests use (ref yolox/core/launch.py:38-131 multi-host
    path).  Default 2x4; the 4-process test runs 4x2."""
    devices_per_proc = devices_per_proc or 8 // num
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cocodet_tpu.parallel import (initialize_distributed, make_mesh,
                                      data_sharding, replicate)

    initialize_distributed(coordinator, num, pid)
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np

    state, step, imgs, labels = make_tiny_training()
    mesh = make_mesh()
    state = replicate(mesh, state)
    # per-process local half of the global batch -> one global jax.Array
    per = imgs.shape[0] // num
    sh_i = data_sharding(mesh, imgs.ndim)
    sh_l = data_sharding(mesh, labels.ndim)
    g_imgs = jax.make_array_from_process_local_data(
        sh_i, imgs[pid * per:(pid + 1) * per])
    g_labels = jax.make_array_from_process_local_data(
        sh_l, labels[pid * per:(pid + 1) * per])

    new_state, metrics = step(state, g_imgs, g_labels)
    loss = float(metrics["loss"])
    # params stay replicated: every process reads the full updated tree
    psum = checksum(new_state.params)
    print(json.dumps({"pid": pid, "ok": True, "loss": loss,
                      "param_checksum": psum}))


def train2d_mode(coordinator, num, pid):
    """One train step on the process-spanning 2-D (data x space) mesh:
    2 procs x 4 devices -> global (4 data x 2 space) mesh whose DATA axis
    spans processes (VERDICT r3 stretch item; the single-process 2-D path
    is parallel.make_mesh_2d + Trainer._setup_mesh).  Image height keeps
    every feature map at >= 2 rows per space device — the measured
    XLA-SPMD-safe boundary (ROADMAP.md f64 grad-parity study)."""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cocodet_tpu.parallel import initialize_distributed, replicate
    from cocodet_tpu.parallel.mesh import (DATA_AXIS, SPACE_AXIS,
                                           make_mesh_2d)

    initialize_distributed(coordinator, num, pid)
    assert jax.device_count() == 8, jax.device_count()

    # 3-scale model (max stride 32): H=128 keeps >= 2 rows per space
    # device at the deepest level — the XLA-SPMD-safe boundary — at a
    # quarter of the P6/256px compile cost.
    state, step, imgs, labels = make_tiny_training(size=128, name="yolox")
    mesh = make_mesh_2d(2)  # global (4 data x 2 space)
    state = replicate(mesh, state)
    per = imgs.shape[0] // num
    sh_i = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))
    sh_l = NamedSharding(mesh, P(DATA_AXIS, None, None))
    g_imgs = jax.make_array_from_process_local_data(
        sh_i, imgs[pid * per:(pid + 1) * per])
    g_labels = jax.make_array_from_process_local_data(
        sh_l, labels[pid * per:(pid + 1) * per])

    new_state, metrics = step(state, g_imgs, g_labels)
    loss = float(metrics["loss"])
    psum = checksum(new_state.params)
    print(json.dumps({"pid": pid, "ok": True, "loss": loss,
                      "param_checksum": psum}))


def main():
    if "--train2d" in sys.argv:
        coordinator, num, pid = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))
        train2d_mode(coordinator, num, pid)
        return
    if "--train" in sys.argv:
        coordinator, num, pid = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))
        train_mode(coordinator, num, pid)
        return
    coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cocodet_tpu.parallel import (initialize_distributed,
                                      process_allgather_detections,
                                      sync_global_devices)

    initialize_distributed(coordinator, num, pid)
    assert jax.process_count() == num, jax.process_count()
    assert jax.process_index() == pid

    # each process contributes differently-sized python records
    records = [{"image_id": 100 * pid + i, "score": 0.5 + pid}
               for i in range(pid + 1)]
    gathered = process_allgather_detections(records)
    assert len(gathered) == sum(r + 1 for r in range(num)), gathered
    ids = sorted(r["image_id"] for r in gathered)
    assert ids == sorted([100 * p + i for p in range(num)
                          for i in range(p + 1)]), ids

    sync_global_devices("test-barrier")

    # a psum across the global 2x2-device mesh
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    local = jnp.ones((2,)) * (pid + 1)
    total = multihost_utils.process_allgather(local)
    assert total.shape[0] == num * 2 or total.shape == (num, 2), total.shape

    print(json.dumps({"pid": pid, "ok": True, "n_gathered": len(gathered)}))


if __name__ == "__main__":
    main()
