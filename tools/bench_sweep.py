#!/usr/bin/env python3
"""One-process TPU sweep: batch sizes x {model, full}, + pallas NMS check."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, arg, iters=20):
    import jax

    jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    size = 640
    model = build_model("yolox-p6", depth=0.67, width=0.75,
                        dtype=jnp.bfloat16, fused=True)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x1)
    strides = (8, 16, 32, 64)
    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=2048, max_det=300)

    for b in (16, 32):
        x = jnp.asarray(np.random.rand(b, size, size, 3) * 255, jnp.float32)
        fwd = jax.jit(lambda im: model.apply(variables, im))
        t = timeit(fwd, x)
        print(f"b{b} model-only: {1e3 * t:.2f} ms ({b / t:.1f} img/s)",
              flush=True)
        full = jax.jit(lambda im: postprocess(
            model.apply(variables, im), strides, cfg))
        t = timeit(full, x)
        print(f"b{b} full(k=2048): {1e3 * t:.2f} ms ({b / t:.1f} img/s)",
              flush=True)

    # pallas overlap kernel correctness + speed on the real chip
    from cocodet_tpu.ops.boxes import pairwise_iou
    from cocodet_tpu.ops.pallas.nms_kernels import overlap_matrix

    rs = np.random.RandomState(0)
    k = 2048
    centers = rs.rand(k, 2) * 600
    wh = rs.rand(k, 2) * 80 + 4
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       1), jnp.float32)
    valid = jnp.asarray(rs.rand(k) > 0.1)

    got = np.asarray(overlap_matrix(boxes, valid, 0.55))
    iou = pairwise_iou(boxes, boxes)
    order = jnp.arange(k)
    exp = np.asarray(((iou > 0.55) & (order[:, None] < order[None, :])
                      & valid[:, None] & valid[None, :]).astype(jnp.float32))
    print("pallas overlap matches jnp on TPU:", bool((got == exp).all()),
          flush=True)

    f_pl = jax.jit(lambda bx: overlap_matrix(bx, valid, 0.55))
    f_jnp = jax.jit(lambda bx: (
        (pairwise_iou(bx, bx) > 0.55)
        & (order[:, None] < order[None, :])
        & valid[:, None] & valid[None, :]).astype(jnp.float32))
    print(f"overlap k={k}: pallas {1e6 * timeit(f_pl, boxes):.0f} us, "
          f"jnp {1e6 * timeit(f_jnp, boxes):.0f} us", flush=True)


if __name__ == "__main__":
    main()
