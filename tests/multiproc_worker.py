"""Worker script for the 2-process jax.distributed test (run via
subprocess by test_multiprocess.py). Exercises initialize_distributed,
process_allgather_detections and sync_global_devices
(cocodet_tpu/parallel/mesh.py:34-97; ref yolox/utils/dist.py:186-265)."""

import json
import os
import sys


def main():
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
