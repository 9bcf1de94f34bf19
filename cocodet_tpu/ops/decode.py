"""Grid decode of raw head outputs — pure jnp, shape-static, fuses under jit.

Parity targets:
  - training-time decode  ref yolox/models/yolo_head.py:192-225
    (get_output_and_grid / decode_outputs: xy=(pred+grid)*stride,
     wh=exp(pred)*stride)
  - inference decode      ref choijhanyangackr/yolox_infer/postprocess_utils.py:6-52
    (grid cache + corner boxes + sigmoid obj/cls)

TPU notes: grids are computed inside the traced function from static shapes —
XLA constant-folds them, so there is nothing to cache host-side (the
reference's per-shape grid cache is a GPU/python-overhead workaround).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def level_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h*w, 2) xy grid coordinates, row-major (x fastest) — matching the
    meshgrid+stack order of ref yolo_head.py:203-205."""
    xv, yv = jnp.meshgrid(jnp.arange(w, dtype=dtype), jnp.arange(h, dtype=dtype))
    return jnp.stack([xv, yv], axis=-1).reshape(-1, 2)


def flatten_level(out: dict) -> jnp.ndarray:
    """NHWC head maps {reg,obj,cls} -> (B, H*W, 5+C) with [reg, obj, cls] order."""
    b, h, w, _ = out["reg"].shape
    cat = jnp.concatenate([out["reg"], out["obj"], out["cls"]], axis=-1)
    return cat.reshape(b, h * w, -1)


def concat_levels(outputs: Sequence[dict]) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate per-level head outputs into anchor-major tensors.

    Returns (preds (B, A, 5+C), grids (A, 2), strides (A,)).
    """
    preds, grids, strides = [], [], []
    for out in outputs:
        b, h, w, _ = out["reg"].shape
        preds.append(flatten_level(out))
        grids.append(level_grid(h, w))
        strides.append(jnp.full((h * w,), float(out["stride"]), jnp.float32))
    return (
        jnp.concatenate(preds, axis=1),
        jnp.concatenate(grids, axis=0),
        jnp.concatenate(strides, axis=0),
    )


def attach_strides(outputs: Sequence[dict], stride_list: Sequence[int]) -> List[dict]:
    return [dict(o, stride=s) for o, s in zip(outputs, stride_list)]


def decode_center_format(preds: jnp.ndarray, grids: jnp.ndarray,
                         strides: jnp.ndarray) -> jnp.ndarray:
    """Training-space decode to (cx, cy, w, h) in input pixels.

    xy = (p + grid) * stride ; wh = exp(p) * stride
    (ref yolo_head.py:210-214 / 216-225).
    """
    f32 = preds.astype(jnp.float32)
    s = strides[None, :, None]
    xy = (f32[..., :2] + grids[None]) * s
    wh = jnp.exp(f32[..., 2:4]) * s
    return jnp.concatenate([xy, wh, f32[..., 4:]], axis=-1)


def decode_corner_scores(preds: jnp.ndarray, grids: jnp.ndarray,
                         strides: jnp.ndarray):
    """Inference decode: corner boxes + sigmoid scores.

    Returns (boxes_xyxy (B,A,4), obj (B,A,1), cls (B,A,C) with cls already
    multiplied by obj) — semantics of ref postprocess_utils.py:27-52.
    """
    f32 = preds.astype(jnp.float32)
    s = strides[None, :, None]
    xy = (f32[..., :2] + grids[None]) * s
    # clamp the raw wh logits: an untrained/half-trained model can emit
    # values whose exp overflows to inf, which would poison the NMS
    # class-offset span and IoU math downstream (real preds are < ~7)
    half_wh = jnp.exp(jnp.clip(f32[..., 2:4], -20.0, 20.0)) * (s * 0.5)
    boxes = jnp.concatenate([xy - half_wh, xy + half_wh], axis=-1)
    obj = jnp.clip(jnp.float32(1.0) / (1.0 + jnp.exp(-f32[..., 4:5])), 0.0, 1.0)
    cls = jnp.clip(jnp.float32(1.0) / (1.0 + jnp.exp(-f32[..., 5:])), 0.0, 1.0) * obj
    return boxes, obj, cls
