"""f64 gradient-parity check for the 2-D (data, space) training mesh.

Run by tests/test_training.py::test_2d_mesh_grad_parity_f64 in a
subprocess (jax_enable_x64 is process-global).  Compares every parameter
gradient of the full YOLOX-P6 train loss between a single device and a
(4 data, 2 space) mesh at a Trainer._check_spatial_sizes-valid size
(256x64 input -> deepest map 4 rows = 2 per space device).

This differential is what EXPOSED the XLA SPMD backward bug at
degenerate sizes (ROADMAP.md round-3 session 3): at 64px/128px inputs
(deepest map < 2 rows per device) conv grads come back multiplied by
exactly-integer factors (4x/16x) even at f64; at >=2 rows per device
everything matches to ~1e-12.  The Trainer guard enforces that boundary.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cocodet_tpu.models import build_model
from cocodet_tpu.ops.losses import yolox_losses
from cocodet_tpu.parallel import make_mesh_2d, replicate, shard_batch


def main() -> int:
    model = build_model("yolox-p6", depth=0.33, width=0.125)
    rng = jax.random.PRNGKey(3)
    imgs = (jax.random.uniform(rng, (4, 256, 64, 3)) * 255.0
            ).astype(jnp.float64)
    labels = jnp.tile(
        jnp.asarray([[[1.0, 32.0, 32.0, 16.0, 16.0]] + [[0.0] * 5] * 4]),
        (4, 1, 1)).astype(jnp.float64)
    variables = model.init(jax.random.PRNGKey(0),
                           imgs[:1].astype(jnp.float32))
    params = jtu.tree_map(lambda x: x.astype(jnp.float64),
                          variables["params"])
    bstats = jtu.tree_map(lambda x: x.astype(jnp.float64),
                          variables["batch_stats"])

    def loss_fn(p, im, lb):
        outputs, _ = model.apply({"params": p, "batch_stats": bstats}, im,
                                 train=True, mutable=["batch_stats"])
        losses, _ = yolox_losses(outputs, lb, strides=(8, 16, 32, 64),
                                 num_classes=80, use_l1=True,
                                 iou_type="iou")
        return losses.total

    g1 = jax.jit(jax.grad(loss_fn))(params, imgs, labels)
    print("single grad done", flush=True)

    mesh = make_mesh_2d(2)
    ps = replicate(mesh, params)
    im_s, lb_s = shard_batch(mesh, (imgs, labels))
    g2 = jax.jit(jax.grad(loss_fn))(ps, im_s, lb_s)
    print("mesh grad done", flush=True)

    worst, worst_path = 0.0, None
    for (p, a), (_, b) in zip(jtu.tree_flatten_with_path(g1)[0],
                              jtu.tree_flatten_with_path(g2)[0]):
        a, b = np.asarray(a), np.asarray(b)
        rel = float(np.abs(a - b).max() / max(np.abs(a).max(), 1e-20))
        if rel > worst:
            worst, worst_path = rel, jtu.keystr(p)
    print(f"worst rel grad diff: {worst:.3e} at {worst_path}")
    if worst < 1e-9:
        print("SPATIAL_PARITY_OK")
        return 0
    print("SPATIAL_PARITY_FAIL")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
