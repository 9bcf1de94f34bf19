"""Pallas TPU kernels for the NMS hot path.

The fixpoint NMS in ops/nms.py needs the strict upper-triangular overlap
matrix  overlap[r, c] = IoU(box_r, box_c) > thr  (r < c, both valid) for K
score-sorted boxes. Building it in jnp materializes the full (K, K) fp32
IoU matrix in HBM; this kernel computes it tile-by-tile in VMEM and writes
only the f32 0/1 overlap matrix (the operand of the fixpoint matvec), with
the IoU math, the threshold compare, the triangular mask, and the validity
mask fused in one pass.

Mosaic note: in-kernel transposes of narrow/bool tiles fail to legalize on
v5e (`tpu.transpose` of vector<128x128xi1>), so the column operands are fed
PRE-TRANSPOSED from the host: boxes as (4, K) and validity as (1, K) /
(K, 1) — the kernel does zero transposes.

Tiling: (TILE, TILE) output tiles over a (K/TILE, K/TILE) grid; each program
reads a (TILE, 4) row slab and a (4, TILE) column slab — tiny — so VMEM is
dominated by the output tile. TILE=128 aligns rows to sublanes and cols to
lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _overlap_kernel(thr_ref, rows_ref, cols_t_ref, rvalid_ref, cvalid_t_ref,
                    out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = rows_ref[:]            # (TILE, 4) xyxy
    cols_t = cols_t_ref[:]        # (4, TILE) xyxy transposed

    rx1 = rows[:, 0:1]
    ry1 = rows[:, 1:2]
    rx2 = rows[:, 2:3]
    ry2 = rows[:, 3:4]
    cx1 = cols_t[0:1, :]
    cy1 = cols_t[1:2, :]
    cx2 = cols_t[2:3, :]
    cy2 = cols_t[3:4, :]

    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1), 0.0)
    inter = iw * ih
    area_r = (rx2 - rx1) * (ry2 - ry1)
    area_c = (cx2 - cx1) * (cy2 - cy1)
    union = jnp.maximum(area_r + area_c - inter, 1e-12)
    iou = inter / union

    # strict upper-triangular in global coordinates: row_idx < col_idx
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
               + i * TILE)
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
               + j * TILE)
    tri = (row_ids < col_ids).astype(jnp.float32)

    valid = rvalid_ref[:] * cvalid_t_ref[:]     # (TILE,1)*(1,TILE)
    mask = (iou > thr_ref[0]).astype(jnp.float32) * tri * valid
    out_ref[:] = mask


@functools.partial(jax.jit, static_argnames=("interpret",))
def overlap_matrix(boxes: jnp.ndarray, valid: jnp.ndarray,
                   iou_threshold: float | jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """(K, K) f32 0/1 strict-upper-triangular overlap matrix.

    boxes: (K, 4) xyxy score-sorted; valid: (K,) bool. K must be a multiple
    of 128 (pad with zeros/invalid).
    """
    k = boxes.shape[0]
    assert k % TILE == 0, k
    thr = jnp.asarray([iou_threshold], jnp.float32)
    grid = (k // TILE, k // TILE)
    boxes = boxes.astype(jnp.float32)
    boxes_t = boxes.T                      # (4, K) — transposed on host/XLA
    vcol = valid.astype(jnp.float32).reshape(k, 1)
    vrow = valid.astype(jnp.float32).reshape(1, k)

    return pl.pallas_call(
        _overlap_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(thr, boxes, boxes_t, vcol, vrow)
