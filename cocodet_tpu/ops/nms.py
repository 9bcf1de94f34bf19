"""Fixed-shape, fully-batched NMS for TPU.

Replaces torchvision nms/batched_nms used by the reference
(ref yolox/utils/boxes.py:32-82; choijhanyangackr/yolox_infer/nms.py:14-42)
with an XLA-friendly algorithm:

  1. top-k by score (static K) instead of boolean-mask gathers,
  2. class-aware suppression via per-class coordinate offsets (the
     torchvision batched_nms trick, which the reference relies on),
  3. exact greedy suppression computed as a fixpoint over the strict
     upper-triangular overlap matrix:

        keep[c] = valid[c] and not any(r<c: keep[r] and iou[r,c] > thr)

     iterated until convergence (lax.while_loop). Each iteration is a masked
     (K,K)x(K) matvec that XLA maps onto the MXU; convergence takes
     O(longest suppression chain) iterations — single digits on real
     detection output — and the result is bit-identical to sequential greedy
     NMS, so mAP parity with the GPU reference is preserved.

Soft-NMS (ref nms.py pt_soft_nms) is provided as an O(K) score-decay scan.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (..., max_det, 4) xyxy
    scores: jnp.ndarray   # (..., max_det)
    classes: jnp.ndarray  # (..., max_det) int32
    obj: jnp.ndarray      # (..., max_det) objectness of kept boxes
    valid: jnp.ndarray    # (..., max_det) bool


def register_export_serialization() -> None:
    """Register NMSResult with jax.export so decoded graphs serialize /
    deserialize (tools/export_stablehlo.py, tools/run_stablehlo.py).
    Idempotent per process."""
    from jax import export as jexport

    try:
        jexport.register_namedtuple_serialization(
            NMSResult, serialized_name="cocodet_tpu.NMSResult")
    except ValueError:
        pass  # already registered


def _greedy_keep(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
                 max_iters: Optional[int] = None,
                 use_pallas: bool = False) -> jnp.ndarray:
    """Exact greedy keep-mask for score-sorted ``boxes`` (K, 4).

    Convergence: after t iterations every box whose longest suppression chain
    is <= t has its final value, so the fixpoint equals sequential greedy NMS
    within at most K iterations (typically <10 on detection output).

    use_pallas: build the overlap matrix with the tiled VMEM kernel
    (ops/pallas/nms_kernels.py) — requires K % 128 == 0.  Measured A/B at
    the production point (slim M-P6, 640/b128/K=1024, v5e): 2408.9 img/s
    with the kernel vs 2430.1 without — XLA's fusion of the
    tile-sequential path is already at parity, so the kernel is kept as a
    tested alternative, not the default.
    """
    k = boxes.shape[0]
    if max_iters is None:
        max_iters = k
    if use_pallas and k % 128 == 0:
        from .pallas.nms_kernels import overlap_matrix

        overlap_f = overlap_matrix(boxes, valid, iou_threshold)
    else:
        iou = pairwise_iou(boxes, boxes)
        order = jnp.arange(k)
        # row r suppresses col c only if r ranks first and both are valid
        overlap = (iou > iou_threshold) & (order[:, None] < order[None, :])
        overlap = overlap & valid[:, None] & valid[None, :]
        overlap_f = overlap.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < max_iters)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.float32) @ overlap_f) > 0.0
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _greedy_keep_tiled(boxes: jnp.ndarray, valid: jnp.ndarray,
                       iou_threshold: float, tile: int = 512) -> jnp.ndarray:
    """Exact greedy keep-mask, tile-sequential formulation.

    The fixpoint in _greedy_keep re-reads the (K, K) overlap matrix from HBM
    every iteration (~10x 16MB at K=2048) — memory-bound. Here the matrix is
    never materialized: a lax.scan walks score-ordered tiles of ``tile``
    boxes; each step computes the (K, tile) IoU block on the fly (boxes are
    32KB — VMEM-resident), suppresses the tile by previously KEPT rows, and
    resolves intra-tile suppression with a small (tile, tile) fixpoint.
    Result is bit-identical to sequential greedy NMS; total IoU work is the
    same single K^2 pass a matrix build would do, with no HBM intermediate.
    """
    k = boxes.shape[0]
    assert k % tile == 0, (k, tile)
    n_tiles = k // tile
    row_idx = jnp.arange(k)
    tri = jnp.arange(tile)

    def tile_fixpoint(cand, overlap_f):
        def cond(state):
            keep, prev, it = state
            return jnp.logical_and(jnp.any(keep != prev), it < tile)

        def body(state):
            keep, _, it = state
            suppressed = (keep.astype(jnp.float32) @ overlap_f) > 0.0
            return cand & ~suppressed, keep, it + 1

        out, _, _ = jax.lax.while_loop(
            cond, body, (cand, jnp.zeros_like(cand), jnp.int32(0)))
        return out

    def step(keep, i):
        start = i * tile
        tb = jax.lax.dynamic_slice(boxes, (start, 0), (tile, 4))
        tv = jax.lax.dynamic_slice(valid, (start,), (tile,))
        iou_kt = pairwise_iou(boxes, tb)                      # (K, tile)
        hit = iou_kt > iou_threshold
        prev = keep & (row_idx < start)                       # finalized rows
        sup_prev = (prev.astype(jnp.float32) @
                    hit.astype(jnp.float32)) > 0.0
        cand = tv & ~sup_prev
        tt = jax.lax.dynamic_slice(hit, (start, 0), (tile, tile))
        overlap = tt & (tri[:, None] < tri[None, :])
        overlap &= cand[:, None] & cand[None, :]
        tile_keep = tile_fixpoint(cand, overlap.astype(jnp.float32))
        keep = jax.lax.dynamic_update_slice(keep, tile_keep, (start,))
        return keep, None

    keep0 = jnp.zeros((k,), bool)
    keep, _ = jax.lax.scan(step, keep0, jnp.arange(n_tiles))
    return keep


def _soft_keep_scores(boxes: jnp.ndarray, scores: jnp.ndarray,
                      valid: jnp.ndarray, iou_threshold: float,
                      sigma: float = 0.5) -> jnp.ndarray:
    """Gaussian soft-NMS score decay (sequential scan over score order)."""
    k = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)

    def body(carry, i):
        s = carry
        # pick current best among unprocessed is implicit: boxes pre-sorted.
        decay = jnp.exp(-(iou[i] ** 2) / sigma)
        decay = jnp.where(jnp.arange(k) > i, decay, 1.0)
        s = s * jnp.where(valid[i], decay, jnp.ones_like(decay))
        return s, None

    s, _ = jax.lax.scan(body, scores, jnp.arange(k))
    return s


def nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    obj: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.65,
    max_det: int = 300,
    class_agnostic: bool = False,
    soft: bool = False,
    use_pallas: bool = False,
) -> NMSResult:
    """NMS for one image. Inputs are (K, …) score-sorted descending."""
    if class_agnostic:
        nms_boxes = boxes
    else:
        # per-class coordinate offset => cross-class IoU is exactly 0.
        # Guard the span against non-finite coordinates so one bad box
        # cannot poison every offset.
        finite = jnp.all(jnp.isfinite(boxes), axis=-1)
        span = jnp.max(jnp.where((valid & finite)[:, None],
                                 jnp.abs(boxes), 0.0)) + 1.0
        offset = classes.astype(boxes.dtype)[:, None] * span
        nms_boxes = boxes + offset

    if soft:
        new_scores = _soft_keep_scores(nms_boxes, scores, valid, iou_threshold)
        keep = valid & (new_scores > 0.0)
        scores = new_scores
        # re-sort by decayed score
        order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf))
        boxes, scores, classes, obj, keep = (
            boxes[order], scores[order], classes[order], obj[order], keep[order])
    else:
        k = boxes.shape[0]
        if k % 512 == 0:
            keep = _greedy_keep_tiled(nms_boxes, valid, iou_threshold)
        else:
            keep = _greedy_keep(nms_boxes, valid, iou_threshold,
                                use_pallas=use_pallas)

    # compact kept detections to the front, cap at max_det: rank kept boxes
    # by (kept, original order) with one top_k — faster than a scatter on
    # TPU and exactly order-preserving (values stay < 2^24 so f32 is exact)
    k = boxes.shape[0]
    rank_val = jnp.where(keep, jnp.float32(k) - jnp.arange(k, dtype=jnp.float32),
                         -1.0 - jnp.arange(k, dtype=jnp.float32))
    m = min(max_det, k)
    top_vals, take = jax.lax.top_k(rank_val, m)
    if m < max_det:  # fewer candidates than the det cap: pad with invalid
        top_vals = jnp.concatenate(
            [top_vals, jnp.full((max_det - m,), -1.0, top_vals.dtype)])
        take = jnp.concatenate(
            [take, jnp.zeros((max_det - m,), take.dtype)])
    in_range = top_vals > 0.0
    take_c = jnp.clip(take, 0, k - 1)
    return NMSResult(
        boxes=jnp.where(in_range[:, None], boxes[take_c], 0.0),
        scores=jnp.where(in_range, scores[take_c], 0.0),
        classes=jnp.where(in_range, classes[take_c], -1),
        obj=jnp.where(in_range, obj[take_c], 0.0),
        valid=in_range,
    )


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    obj: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.65,
    max_det: int = 300,
    class_agnostic: bool = False,
    soft: bool = False,
    use_pallas: bool = False,
) -> NMSResult:
    """vmap of nms_single over the batch dimension."""
    fn = partial(
        nms_single,
        iou_threshold=iou_threshold,
        max_det=max_det,
        class_agnostic=class_agnostic,
        soft=soft,
        use_pallas=use_pallas,
    )
    return jax.vmap(fn)(boxes, scores, classes, obj, valid)
