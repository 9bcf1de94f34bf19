"""Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodet_tpu.ops.boxes import pairwise_iou
from cocodet_tpu.ops.pallas.nms_kernels import overlap_matrix


def test_overlap_matrix_matches_jnp():
    rs = np.random.RandomState(0)
    k = 256
    centers = rs.rand(k, 2) * 200
    wh = rs.rand(k, 2) * 40 + 4
    boxes = jnp.asarray(
        np.concatenate([centers - wh / 2, centers + wh / 2], 1), jnp.float32)
    valid = jnp.asarray(rs.rand(k) > 0.2)
    thr = 0.5

    got = overlap_matrix(boxes, valid, thr, interpret=True)

    iou = pairwise_iou(boxes, boxes)
    order = jnp.arange(k)
    expect = ((iou > thr) & (order[:, None] < order[None, :])
              & valid[:, None] & valid[None, :]).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
