#!/usr/bin/env python3
"""TPU A/B: dense YOLOX-M-P6 vs 49%-channel-slimmed variant at 640/b16.

Quantifies the channel-adaptation payoff (dense narrower convs vs the
reference's sparse-storage-dense-compute approach, which by construction
runs at dense speed — ref 03_jh_merge.py stores COO, main.py:52-55
densifies). Random pruning pattern — architecture-level throughput only.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, a, iters=20):
    import jax

    jax.block_until_ready(fn(a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from cocodet_tpu.compress import merge_for_deployment, slim_channels
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    ratio = float(sys.argv[1]) if len(sys.argv) > 1 else 0.49
    b, size = 16, 640
    strides = (8, 16, 32, 64)
    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=2048, max_det=300, use_pallas=True)

    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    masked = build_model("yolox-p6", depth=0.67, width=0.75, use_mask=True)
    variables = dict(masked.init(rng, x1))

    # random 49% channel pruning over every ChannelMask
    rs = np.random.RandomState(0)
    masks = dict(flatten_dict(variables["masks"]))
    killed = total = 0
    for path in list(masks):
        if path[-2:] != ("mask", "scale"):
            continue
        scale = np.asarray(masks[path]).copy()
        kill = rs.rand(scale.shape[0]) < ratio
        if kill.all():
            kill[0] = False
        scale[kill] = 0.0
        masks[path] = jnp.asarray(scale)
        killed += int(kill.sum())
        total += scale.shape[0]
    variables["masks"] = unflatten_dict(masks)
    print(f"pruned {killed}/{total} prunable channels "
          f"({100 * killed / total:.0f}%)", flush=True)

    merged = merge_for_deployment(variables, eps=1e-3)
    slimmed, spec = slim_channels(merged, variables["masks"])

    def nparams(t):
        return sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(t))

    print(f"params: dense {nparams(merged):,} -> slim {nparams(slimmed):,}",
          flush=True)

    x = jnp.asarray(np.random.rand(b, size, size, 3) * 255, jnp.float32)

    dense_model = build_model("yolox-p6", depth=0.67, width=0.75,
                              fused=True, dtype=jnp.bfloat16)
    f_dense = jax.jit(lambda im: postprocess(
        dense_model.apply(merged, im), strides, cfg))
    t = timeit(f_dense, x)
    print(f"dense  b{b}: {1e3 * t:.2f} ms ({b / t:.1f} img/s)", flush=True)

    slim_model = build_model("yolox-p6", depth=0.67, width=0.75, fused=True,
                             slim=spec, dtype=jnp.bfloat16)
    f_slim = jax.jit(lambda im: postprocess(
        slim_model.apply(slimmed, im), strides, cfg))
    t = timeit(f_slim, x)
    print(f"slim   b{b}: {1e3 * t:.2f} ms ({b / t:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
