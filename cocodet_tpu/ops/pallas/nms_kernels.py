"""Pallas TPU kernels for the NMS hot path.

The fixpoint NMS in ops/nms.py needs the strict upper-triangular overlap
matrix  overlap[r, c] = IoU(box_r, box_c) > thr  (r < c, both valid) for K
score-sorted boxes. Building it in jnp materializes the full (K, K) fp32
IoU matrix in HBM; this kernel computes it tile-by-tile in VMEM and writes
only the f32 0/1 overlap matrix (the operand of the fixpoint matvec), with
the IoU math, the threshold compare, the triangular mask, and the validity
mask fused in one pass.

Tiling: (TILE, TILE) output tiles over a (K/TILE, K/TILE) grid; each program
reads two (TILE, 4) box slabs — tiny — so VMEM usage is dominated by the
output tile. TILE=128 aligns rows to sublanes and cols to lanes.

Grid note: for r-tile > c-tile every entry is below the diagonal; those
tiles still run (pallas grids are dense) but write zeros via the mask —
acceptable at K<=2048. A triangular-only grid is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _overlap_kernel(thr_ref, rows_ref, cols_ref, rvalid_ref, cvalid_ref,
                    out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = rows_ref[:]          # (TILE, 4) xyxy
    cols = cols_ref[:]          # (TILE, 4)

    rx1 = rows[:, 0:1]
    ry1 = rows[:, 1:2]
    rx2 = rows[:, 2:3]
    ry2 = rows[:, 3:4]
    cx1 = cols[:, 0:1].T
    cy1 = cols[:, 1:2].T
    cx2 = cols[:, 2:3].T
    cy2 = cols[:, 3:4].T

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
    tri = row_ids < col_ids

    valid = rvalid_ref[:] & cvalid_ref[:].T  # (TILE,1)&(1,TILE)
    mask = (iou > thr_ref[0]) & tri & valid
    out_ref[:] = mask.astype(jnp.float32)


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
    vcol = valid.reshape(k, 1)

    return pl.pallas_call(
        _overlap_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k), jnp.float32),
        interpret=interpret,
    )(thr, boxes.astype(jnp.float32), boxes.astype(jnp.float32),
      vcol, vcol)
