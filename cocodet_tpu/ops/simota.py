"""SimOTA label assignment — fully vectorized, fixed-shape, batched.

Parity target: ref yolox/models/yolo_head.py:392-595 (get_assignments /
get_in_boxes_info / dynamic_k_matching), re-derived for TPU:

  * The reference loops over images in python, boolean-mask-gathers candidate
    anchors, and loops over GTs for the dynamic-k top-k
    (yolo_head.py:261-353, 571-575) — all shapes dynamic, with a CUDA-OOM
    catch-and-retry-on-CPU fallback (yolo_head.py:298-327).
  * Here everything is a (B, G, A) masked tensor program: padded GTs
    (max_labels from the data layer, ref data_augment.py:207-211), the full
    cost tensor, per-row rank comparison instead of per-GT topk, and a
    one-shot argmin for conflict resolution. Fixed memory by construction —
    no fallback needed — and every op maps onto VPU/MXU.

Math parity notes:
  * cls cost: BCE(sqrt(sigmoid(cls)*sigmoid(obj)), onehot) summed over
    classes (ref yolo_head.py:452-460). Expanding the one-hot sum removes the
    (G, A, C) intermediate:
        cost_cls[g,a] = -log sp[a,c_g] + log(1-sp[a,c_g]) - S[a],
        S[a] = sum_j log(1-sp[a,j])
    so memory is (A, C) + (G, A) instead of (G, A, C).
  * dynamic_k = clamp(int(sum(top10 IoU over candidates)), min=1)
    (ref yolo_head.py:566-568); int() truncates toward zero.
  * conflict resolution: anchors matched to >1 GT keep only the min-cost GT
    (ref yolo_head.py:576-580).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_BIG = 1e5      # not-in-both penalty (ref yolo_head.py:467)
_INF = 1e9      # non-candidate / invalid-gt exclusion


class SimOTATargets(NamedTuple):
    """Per-anchor training targets (all fixed shape, batched)."""

    fg_mask: jnp.ndarray       # (B, A) bool — positive anchors
    cls_target: jnp.ndarray    # (B, A, C) — iou-weighted one-hot (0 for bg)
    reg_target: jnp.ndarray    # (B, A, 4) — matched gt cxcywh (0 for bg)
    l1_target: jnp.ndarray     # (B, A, 4) — encoded gt for L1 (0 for bg)
    num_fg: jnp.ndarray        # () — total positives in batch (float)
    num_gts: jnp.ndarray       # () — total gts in batch (float)


def _binary_cross_entropy_terms(sp: jnp.ndarray, eps: float = 1e-12):
    """log(sp), log(1-sp) with torch-style clamping (log >= -100)."""
    log_p = jnp.maximum(jnp.log(jnp.maximum(sp, eps)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - sp, eps)), -100.0)
    return log_p, log_1p


def _topk_small(x: jnp.ndarray, k: int):
    """Exact top-k along the last axis via k unrolled max/argmax rounds.

    jax.lax.top_k lowers to a full O(A log^2 A) sort on TPU; for the tiny
    k SimOTA needs (<= 10) k linear passes over the row are far cheaper
    (A ~ 8.5k at 640px). Ties resolve to the lowest index, matching
    jax.lax.top_k. Returns (values (..., k), indices (..., k))."""
    vals, idxs = [], []
    neg = jnp.asarray(-jnp.inf, x.dtype)
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        x = jnp.where(
            jax.nn.one_hot(i, x.shape[-1], dtype=bool), neg, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def assign_single(
    labels: jnp.ndarray,       # (G, 5) [class, cx, cy, w, h], zero-padded
    pred_boxes: jnp.ndarray,   # (A, 4) decoded cxcywh (input pixels)
    cls_logits: jnp.ndarray,   # (A, C)
    obj_logits: jnp.ndarray,   # (A, 1)
    centers: jnp.ndarray,      # (A, 2) anchor centers ((shift+0.5)*stride)
    strides: jnp.ndarray,      # (A,)
    num_classes: int,
    center_radius: float = 2.5,
    compute_dtype=jnp.float32,
):
    """SimOTA for one image. Returns per-anchor targets + counters.

    compute_dtype: dtype for the (G, A) cost/IoU matrices and the top-k
    scans over them — the HBM-traffic bulk of the assignment.  bf16 here
    halves that traffic; it only perturbs WHICH anchors are selected
    (IoU rel-err ~0.4% can flip a near-tie rank or a dynamic_k truncation
    boundary), never the gradient numerics: assignment is a stop-gradient
    region and every emitted target (cls/reg/l1) is built from the
    original f32 boxes.  Default f32 = exact reference parity.
    """
    g = labels.shape[0]
    a = pred_boxes.shape[0]
    cdt = compute_dtype

    gt_valid = jnp.sum(labels, axis=1) > 0          # ref nlabel (yolo_head.py:253)
    gt_cls = labels[:, 0].astype(jnp.int32)
    gt_box = labels[:, 1:5]                          # cxcywh

    # ---- geometric priors (ref get_in_boxes_info, yolo_head.py:490-559) ----
    cx, cy = centers[:, 0], centers[:, 1]
    gl = gt_box[:, 0] - 0.5 * gt_box[:, 2]
    gr = gt_box[:, 0] + 0.5 * gt_box[:, 2]
    gt = gt_box[:, 1] - 0.5 * gt_box[:, 3]
    gb = gt_box[:, 1] + 0.5 * gt_box[:, 3]
    in_box = (
        (cx[None, :] > gl[:, None]) & (cx[None, :] < gr[:, None])
        & (cy[None, :] > gt[:, None]) & (cy[None, :] < gb[:, None])
    )
    r = center_radius * strides[None, :]
    in_center = (
        (cx[None, :] > gt_box[:, 0:1] - r) & (cx[None, :] < gt_box[:, 0:1] + r)
        & (cy[None, :] > gt_box[:, 1:2] - r) & (cy[None, :] < gt_box[:, 1:2] + r)
    )
    in_box &= gt_valid[:, None]
    in_center &= gt_valid[:, None]
    candidate = jnp.any(in_box | in_center, axis=0)   # (A,) fg candidates
    in_both = in_box & in_center

    # ---- pairwise IoU over candidates (ref yolo_head.py:441) ----
    iou = pairwise_iou(gt_box.astype(cdt), pred_boxes.astype(cdt),
                       xyxy=False)                           # (G, A) cdt
    iou_cand = jnp.where(candidate[None, :] & gt_valid[:, None], iou,
                         jnp.zeros((), cdt))

    # ---- classification cost without the (G,A,C) intermediate ----
    sp = jnp.sqrt(
        jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        * jax.nn.sigmoid(obj_logits.astype(jnp.float32))
    )  # (A, C) — f32: sqrt(sigmoid*sigmoid) underflows in bf16 tails
    log_p, log_1p = _binary_cross_entropy_terms(sp)
    s_all = jnp.sum(log_1p, axis=-1)                          # (A,) f32
    gathered_p = log_p.astype(cdt)[:, gt_cls].T               # (G, A) cdt
    gathered_1p = log_1p.astype(cdt)[:, gt_cls].T             # (G, A) cdt
    cost_cls = -(gathered_p) + gathered_1p - s_all.astype(cdt)[None, :]

    cost_iou = -jnp.log(iou.astype(jnp.float32) + 1e-8)
    # The final assembly is ALWAYS f32 (ADVICE r4): adding _BIG=1e5 in
    # bf16 (8 mantissa bits) absorbs the cost_cls/cost_iou differences of
    # every not-in-both candidate, so when dynamic_k exceeds the
    # in-box-and-center count the fallback selection would degenerate
    # from min-cost to arbitrary tie order.  Only the data-dependent
    # (G, A) terms (IoU matrix, gathered BCE) compute in ``cdt`` — the
    # elementwise f32 sum costs ~nothing next to pairwise_iou/gathers.
    cost = (
        cost_cls.astype(jnp.float32)
        + 3.0 * cost_iou
        + _BIG * (~in_both)
        + _INF * (~candidate[None, :])
        + _INF * (~gt_valid[:, None])
    )

    # ---- dynamic-k (ref dynamic_k_matching, yolo_head.py:561-575) ----
    k_cap = min(10, a)
    topk_iou, _ = _topk_small(iou_cand, k_cap)
    dynamic_k = jnp.maximum(
        jnp.sum(topk_iou.astype(jnp.float32), axis=1).astype(jnp.int32),
        1)                                                    # (G,)

    # dynamic_k = int(sum of top-10 IoUs) <= 10 by construction, so the
    # k-smallest-cost selection only ever needs the 10 best anchors per
    # gt: top_k over the negated cost + a bounded scatter replaces a full
    # (G, A) argsort (A ~ 8.5k at 640px — the argsort dominated the whole
    # train step on TPU: 592 ms of a 1000 ms step at b128)
    neg_vals, top_idx = _topk_small(-cost, k_cap)             # (G, k)
    sel = (
        (jnp.arange(k_cap)[None, :] < dynamic_k[:, None])
        & (-neg_vals < _INF * 0.5)    # exclude _INF-masked pairs even if
        & gt_valid[:, None]           # a tiny gt has k > #candidates
    )
    matched = jnp.zeros((g, a), bool).at[
        jnp.arange(g)[:, None], top_idx].set(sel)

    # ---- conflict resolution: min-cost gt wins (ref yolo_head.py:576-580) ----
    n_match = jnp.sum(matched, axis=0)                        # (A,)
    best_gt = jnp.argmin(jnp.where(matched, cost, jnp.inf), axis=0)
    keep_row = jax.nn.one_hot(best_gt, g, axis=0, dtype=bool) # (G, A)
    matched = jnp.where(n_match[None, :] > 1, matched & keep_row, matched)

    fg = jnp.any(matched, axis=0)                             # (A,)
    matched_gt = jnp.argmax(matched, axis=0)                  # (A,)
    pred_iou = jnp.sum(
        jnp.where(matched, iou, jnp.zeros((), cdt)), axis=0
    ).astype(jnp.float32)                                     # (A,)

    # ---- targets (ref yolo_head.py:330-346) ----
    cls_t = (
        jax.nn.one_hot(gt_cls[matched_gt], num_classes, dtype=jnp.float32)
        * pred_iou[:, None]
    ) * fg[:, None]
    reg_t = gt_box[matched_gt] * fg[:, None]

    # L1 target (ref get_l1_target, yolo_head.py:383-389)
    shift = centers / strides[:, None] - 0.5                  # integer shifts
    l1_xy = reg_t[:, :2] / strides[:, None] - shift
    l1_wh = jnp.log(reg_t[:, 2:] / strides[:, None] + 1e-8)
    l1_t = jnp.concatenate([l1_xy, l1_wh], axis=-1) * fg[:, None]

    num_fg = jnp.sum(fg.astype(jnp.float32))
    num_gt = jnp.sum(gt_valid.astype(jnp.float32))
    return fg, cls_t, reg_t, l1_t, num_fg, num_gt


def simota_assign(
    labels: jnp.ndarray,       # (B, G, 5)
    pred_boxes: jnp.ndarray,   # (B, A, 4) decoded cxcywh — stop-gradiented
    cls_logits: jnp.ndarray,   # (B, A, C)
    obj_logits: jnp.ndarray,   # (B, A, 1)
    centers: jnp.ndarray,      # (A, 2)
    strides: jnp.ndarray,      # (A,)
    num_classes: int,
    center_radius: float = 2.5,
    compute_dtype=jnp.float32,
) -> SimOTATargets:
    """Batched SimOTA. All inputs are stop-gradiented internally (the
    reference runs assignment under torch.no_grad, yolo_head.py:390-391).

    compute_dtype: see assign_single — bf16 halves the (B, G, A) cost/IoU
    HBM traffic (the assignment is ~the whole loss-stage cost at b128);
    emitted targets stay f32 either way."""
    sg = jax.lax.stop_gradient
    fg, cls_t, reg_t, l1_t, num_fg, num_gt = jax.vmap(
        lambda l, b, c, o: assign_single(
            l, b, c, o, centers, strides, num_classes, center_radius,
            compute_dtype=compute_dtype)
    )(sg(labels), sg(pred_boxes), sg(cls_logits), sg(obj_logits))
    return SimOTATargets(
        fg_mask=fg,
        cls_target=cls_t,
        reg_target=reg_t,
        l1_target=l1_t,
        num_fg=jnp.sum(num_fg),
        num_gts=jnp.sum(num_gt),
    )
