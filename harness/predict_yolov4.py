#!/usr/bin/env python3
"""YOLOv4-P6 smoke-test forward.

Parity target: ref submit/predict_yolov4.py:1-16 (graph builds + forward
shape check @1280).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models.anchor_zoo import (build_anchor_model,
                                               decode_anchor_outputs)

    model, anchors, strides = build_anchor_model("yolov4-p6", fused=True,
                                                 dtype=jnp.bfloat16)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)  # 1280 in production
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    n = sum(int(np.prod(np.shape(p)))
            for p in jax.tree_util.tree_leaves(variables))
    outs = model.apply(variables, x)
    boxes, obj, cls = decode_anchor_outputs(outs, anchors, strides, 80)
    print(f"yolov4-p6: {n:,} params; levels "
          f"{[tuple(o.shape) for o in outs]}; decoded {boxes.shape}")


if __name__ == "__main__":
    main()
