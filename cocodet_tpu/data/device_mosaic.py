"""On-device (XLA) mosaic + random-affine + mixup composition.

Parity target: the host mosaic path (mosaic.py:123-210 `_mosaic_item` /
`mixup`, transforms.py:61-105 `get_affine_matrix` / `random_affine`;
ref yolox/data/data_augment.py:48-133 and the upstream MosaicDetection
semantics rebuilt there).  With this module the host keeps ONLY image
decode and RNG/index selection; every per-pixel op of the train input
pipeline — mosaic tile resize + compose, the random affine warp, mixup,
then the TrainTransform stage (device_aug.py) — runs on the accelerator,
completing the BASELINE.json north-star sentence ("mosaic, mixup,
letterbox resize, HSV jitter moves on-device as XLA transforms").

TPU design notes:
  * Everything is static-shape: raw tiles arrive in (src_h, src_w)
    uint8 buffers with true (h, w) carried densely; mosaic center,
    affine matrix and mixup parameters are DYNAMIC per-item values
    inside one jitted program (no recompiles across draws).
  * The 2x-canvas compose is four masked separable bilinear resamples
    (row gather then shared-index column take — the letterbox machinery
    of device_aug.py generalised with per-tile offsets).  Tile rects are
    disjoint by construction, so a `where` chain over a 114 background
    reproduces the host's paste exactly.
  * The affine warp uses the classic Catmull–Smith two-pass transform:
    pass 1 resamples every canvas ROW at u(x, v) = (x - m02 - m01*v)/m00
    (solving the forward x-equation for u at fixed integer v), pass 2
    resamples COLUMNS at v(y, x) = c*(x - m02) + d*(y - m12).  Each pass
    is a per-line integer shift (batched dynamic-slice on a doubled
    line = a contiguous-slice gather, cheap DMA on TPU) plus three
    shared-index takes and an elementwise 2-tap blend — no 2-D scatter/
    gather anywhere.  For axis-aligned draws (degrees = shear = 0) this
    equals separable bilinear, i.e. cv2.warpAffine; with rotation the
    two passes sample a parallelogram footprint instead of a square —
    bounded sub-pixel smoothing (|m01/m00| <= tan(12 deg) px), which a
    tolerance parity test covers.
  * Box math (tile shift + affine corners + mixup scale/flip/crop) is
    plain arithmetic, bit-matching the host float math.
  * All randomness is drawn host-side in the host path's exact call
    order (DeviceMosaicDataset.fetch) and shipped as a dense vector —
    derived values (the 2x3 matrix itself, int center, int offsets) are
    computed on host so device f32 trig cannot diverge from host f64.

Memory: the 2x canvas is (2H, 2W, 3) f32 per item; `mosaic_mixup_batch`
processes the batch in chunks of ``chunk`` items via lax.map so peak
transient stays ~chunk * 60 MB at 640 px regardless of batch size.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-item mosaic/mixup parameter vector (host-derived, see
# draw_mosaic_params):
#   [0]     use_mosaic (0/1)
#   [1:3]   yc, xc          (already int()'d by the host draw)
#   [3:9]   affine m row-major (m00 m01 m02 m10 m11 m12)
#   [9]     use_mixup (0/1)
#   [10]    mixup jit scale
#   [11]    mixup flip (0/1)
#   [12:14] mixup x_off, y_off (already int()'d)
#   [14:16] mixup resized tw2, th2 = int(iw*jit), int(ih*jit) — computed
#           host-side in f64: a device f32 floor could land one pixel off
#           at integer boundaries, desynced from the x_off/y_off draws
N_MOSAIC_RANDOMS = 16


def get_affine_params(target_size: Tuple[int, int], degrees, translate,
                      scales, shear, rng) -> np.ndarray:
    """Host twin of transforms.get_affine_matrix (transforms.py:61-79):
    identical rng call order (angle, scale, shear_x, shear_y, tx, ty) and
    float64 matrix math, returned as the flat [m00 m01 m02 m10 m11 m12]."""

    def _rand(value, center=0.0):
        if isinstance(value, (int, float)):
            return rng.uniform(center - value, center + value)
        return rng.uniform(value[0], value[1])

    tw, th = target_size
    angle = _rand(degrees)
    scale = _rand(scales, center=1.0)
    if scale <= 0.0:
        raise ValueError("scale must be positive")
    # cv2.getRotationMatrix2D(center=(0,0), angle, scale): note cv2 uses
    # alpha = scale*cos, beta = scale*sin with a POSITIVE-angle ccw
    # convention in image coords: [[alpha, beta], [-beta, alpha]]
    rad = math.radians(angle)
    alpha, beta = scale * math.cos(rad), scale * math.sin(rad)
    rot = np.array([[alpha, beta, 0.0], [-beta, alpha, 0.0]])
    shear_x = math.tan(_rand(shear) * math.pi / 180)
    shear_y = math.tan(_rand(shear) * math.pi / 180)
    m = np.ones((2, 3))
    m[0] = rot[0] + shear_y * rot[1]
    m[1] = rot[1] + shear_x * rot[0]
    m[0, 2] = _rand(translate) * tw
    m[1, 2] = _rand(translate) * th
    return m.reshape(6).astype(np.float64)


# ---------------------------------------------------------------------------
# Canvas compose: 4 tiles -> (2H, 2W) around a random center
# ---------------------------------------------------------------------------

def _tile_rects(yc, xc, nh, nw, ih: int, iw: int):
    """Device twin of mosaic._mosaic_tile_coords for all 4 positions at
    once.  Returns per-tile (x1, y1, x2, y2, padw, padh) stacked (4,);
    padw/padh shift canvas coords into resized-tile coords."""
    z = jnp.zeros((), jnp.int32)
    x1 = jnp.stack([jnp.maximum(xc - nw[0], z), xc,
                    jnp.maximum(xc - nw[2], z), xc])
    y1 = jnp.stack([jnp.maximum(yc - nh[0], z),
                    jnp.maximum(yc - nh[1], z), yc, yc])
    x2 = jnp.stack([xc, jnp.minimum(xc + nw[1], 2 * iw),
                    xc, jnp.minimum(xc + nw[3], 2 * iw)])
    y2 = jnp.stack([yc, yc, jnp.minimum(2 * ih, yc + nh[2]),
                    jnp.minimum(2 * ih, yc + nh[3])])
    # source-crop origins (mosaic.py:35-49): e.g. tile 0 keeps its
    # bottom-right (sx1 = nw - rect_w), tile 3 its top-left (sx1 = 0)
    sx1 = jnp.stack([nw[0] - (x2[0] - x1[0]), z,
                     nw[2] - (x2[2] - x1[2]), z])
    sy1 = jnp.stack([nh[0] - (y2[0] - y1[0]), nh[1] - (y2[1] - y1[1]),
                     z, z])
    padw = x1 - sx1
    padh = y1 - sy1
    return x1, y1, x2, y2, padw, padh


def _sample_tile_to_canvas(tile, h0, w0, nh, nw, padw, padh,
                           out_h: int, out_w: int):
    """Separable bilinear sample of one raw tile onto canvas coordinates:
    canvas (u, v) reads resized-tile (u - padw, v - padh), which reads the
    raw tile with cv2.resize INTER_LINEAR semantics at scale nh/h0, nw/w0
    (the host resizes with cv2.resize to (nw, nh), mosaic.py:139-141)."""
    sy = nh.astype(jnp.float32) / h0.astype(jnp.float32)
    sx = nw.astype(jnp.float32) / w0.astype(jnp.float32)
    v = jnp.arange(out_h, dtype=jnp.float32) - padh.astype(jnp.float32)
    u = jnp.arange(out_w, dtype=jnp.float32) - padw.astype(jnp.float32)
    py = (v + 0.5) / sy - 0.5
    px = (u + 0.5) / sx - 0.5
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    wy = jnp.clip(py - y0f, 0.0, 1.0)
    wx = jnp.clip(px - x0f, 0.0, 1.0)
    hi_y = jnp.maximum(h0 - 1, 0)
    hi_x = jnp.maximum(w0 - 1, 0)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, hi_y)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, hi_y)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, hi_x)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, hi_x)
    img = tile.astype(jnp.float32)
    rows = img[y0] * (1.0 - wy)[:, None, None] + img[y1] * wy[:, None, None]
    return (rows[:, x0] * (1.0 - wx)[None, :, None]
            + rows[:, x1] * wx[None, :, None])


def compose_canvas(tiles, hw, nhw, yc, xc, out_size: Tuple[int, int]):
    """Paste 4 resized tiles around center (xc, yc) on a 2x canvas of 114
    (mosaic.py:131-149).  tiles: (4, sh, sw, 3); hw: (4, 2) int32;
    nhw: (4, 2) int32 resized sizes int(h*s), int(w*s) — computed on the
    HOST in f64 (device f32 flooring can land one pixel off at integer
    boundaries, e.g. floor(57 * f32(64/57))).
    Returns canvas (2*ih, 2*iw, 3) f32 (integer-valued, like the host's
    uint8 canvas) and per-tile (scale s, padw, padh) for the label math."""
    ih, iw = out_size
    h0 = hw[:, 0].astype(jnp.float32)
    w0 = hw[:, 1].astype(jnp.float32)
    s = jnp.minimum(ih / h0, iw / w0)
    nh = nhw[:, 0]
    nw = nhw[:, 1]
    x1, y1, x2, y2, padw, padh = _tile_rects(yc, xc, nh, nw, ih, iw)

    vv = jnp.arange(2 * ih)[:, None]
    uu = jnp.arange(2 * iw)[None, :]
    canvas = jnp.full((2 * ih, 2 * iw, 3), 114.0, jnp.float32)
    for t in range(4):
        sample = _sample_tile_to_canvas(
            tiles[t], hw[t, 0], hw[t, 1], nh[t], nw[t], padw[t], padh[t],
            2 * ih, 2 * iw)
        live = ((vv >= y1[t]) & (vv < y2[t])
                & (uu >= x1[t]) & (uu < x2[t]))
        canvas = jnp.where(live[..., None], sample, canvas)
    # host canvas is uint8 (cv2.resize already rounded per tile)
    canvas = jnp.round(jnp.clip(canvas, 0.0, 255.0))
    return canvas, (s, padw.astype(jnp.float32), padh.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Affine warp: Catmull–Smith two-pass resample
# ---------------------------------------------------------------------------

def _shift_scale_pass(img, scale, offsets, out_cols: int,
                      border: float = 114.0):
    """Resample every row r of ``img`` (R, C, 3) at positions
    p(r, j) = scale * j + offsets[r], j in [0, out_cols) — linear interp,
    constant border outside [0, C-1].

    TPU-shaped: the per-row integer part of the offset becomes a batched
    dynamic-slice on a doubled row (contiguous DMA); the column part uses
    three shared index vectors (the +1 covers the per-row fractional
    carry, the +2 the second interpolation tap)."""
    R, C = img.shape[0], img.shape[1]
    j = jnp.arange(out_cols, dtype=jnp.float32)
    q = scale * j                       # shared across rows
    b0 = jnp.floor(q).astype(jnp.int32)
    fq = q - jnp.floor(q)

    ko = jnp.floor(offsets).astype(jnp.int32)      # (R,)
    fo = offsets - jnp.floor(offsets)              # (R,) in [0, 1)

    doubled = jnp.concatenate([img, img], axis=1)  # (R, 2C, 3)

    def _roll(row, k):
        return jax.lax.dynamic_slice(row, (k % C, 0), (C, row.shape[-1]))

    rolled = jax.vmap(_roll)(doubled, ko)          # rolled[r, j] = img[r, (j+ko) % C]

    j0 = b0 % C
    taps = [rolled[:, (j0 + k) % C] for k in range(3)]  # 3 x (R, out, 3)

    carry = (fq[None, :] + fo[:, None]) >= 1.0     # (R, out)
    w = fq[None, :] + fo[:, None] - carry          # frac of true position
    lo = jnp.where(carry[..., None], taps[1], taps[0])
    hi = jnp.where(carry[..., None], taps[2], taps[1])

    # true integer tap indices, for border masking
    i0 = ko[:, None] + b0[None, :] + carry.astype(jnp.int32)
    lo = jnp.where(((i0 >= 0) & (i0 <= C - 1))[..., None], lo, border)
    hi = jnp.where(((i0 + 1 >= 0) & (i0 + 1 <= C - 1))[..., None], hi, border)
    return lo * (1.0 - w[..., None]) + hi * w[..., None]


def affine_warp(canvas, m, out_size: Tuple[int, int],
                border: float = 114.0):
    """cv2.warpAffine(canvas, m, dsize=out_size, borderValue=114) on the
    device: dst(x, y) samples canvas at A^-1((x,y) - t) where m = [A | t]
    (transforms.py:102).  ``m`` is the flat (6,) forward matrix."""
    ih, iw = out_size[1], out_size[0]  # out_size is (tw, th) like cv2 dsize
    tw, th = out_size
    m00, m01, m02, m10, m11, m12 = (m[0], m[1], m[2], m[3], m[4], m[5])
    det = m00 * m11 - m01 * m10
    # A^-1 rows (guarded: |det|, |m00| never approach 0 for the recipe's
    # parameter ranges — degrees<=10+shear<=2 off 90, scale in [0.5,1.5])
    safe_det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    safe_m00 = jnp.where(jnp.abs(m00) < 1e-3, 1e-3, m00)
    c = -m10 / safe_det
    d = m00 / safe_det

    # pass 1 (rows): H[v, x] = canvas[v, (x - m02 - m01*v) / m00]
    off1 = (-m02 - m01 * jnp.arange(canvas.shape[0], dtype=jnp.float32)) \
        / safe_m00
    H = _shift_scale_pass(canvas, 1.0 / safe_m00, off1, tw, border)

    # pass 2 (columns): out[y, x] = H[c*(x - m02) + d*(y - m12), x]
    off2 = c * (jnp.arange(tw, dtype=jnp.float32) - m02) - d * m12
    Ht = jnp.swapaxes(H, 0, 1)                     # (tw, 2ih, 3)
    out = _shift_scale_pass(Ht, d, off2, th, border)
    out = jnp.swapaxes(out, 0, 1)                  # (th, tw, 3)
    return jnp.round(jnp.clip(out, 0.0, 255.0))


def affine_boxes(boxes_xyxy, m, out_size: Tuple[int, int]):
    """transforms.apply_affine_to_bboxes in jnp: warp the 4 corners through
    the FORWARD matrix, take the enclosing box, clip (transforms.py:82-94)."""
    tw, th = out_size
    m00, m01, m02, m10, m11, m12 = (m[0], m[1], m[2], m[3], m[4], m[5])
    x1, y1, x2, y2 = (boxes_xyxy[:, 0], boxes_xyxy[:, 1],
                      boxes_xyxy[:, 2], boxes_xyxy[:, 3])
    cx = jnp.stack([x1, x1, x2, x2], axis=1)
    cy = jnp.stack([y1, y2, y1, y2], axis=1)
    wx = m00 * cx + m01 * cy + m02
    wy = m10 * cx + m11 * cy + m12
    nx1 = jnp.clip(wx.min(axis=1), 0, tw)
    nx2 = jnp.clip(wx.max(axis=1), 0, tw)
    ny1 = jnp.clip(wy.min(axis=1), 0, th)
    ny2 = jnp.clip(wy.max(axis=1), 0, th)
    return jnp.stack([nx1, ny1, nx2, ny2], axis=1)


# ---------------------------------------------------------------------------
# Mixup (device twin of mosaic.MosaicDetection.mixup, mosaic.py:159-210)
# ---------------------------------------------------------------------------

def _mixup_partner(tile, hw, out_size: Tuple[int, int], grid_hw,
                   origin_hw, jit_scale, flip, x_off, y_off,
                   jit_tw2, jit_th2, nhw=None):
    """Partner image pipeline: letterbox into (ih, iw) -> cv2.resize the
    PADDED buffer by ``jit_scale`` -> optional horizontal flip -> pad/crop
    at (x_off, y_off) to the ORIGIN image's (oh, ow) (mosaic.py:190-196 —
    for a mosaic origin that's (ih, iw); for a passthrough origin the raw
    size).  Two interpolation stages, like the host.  ``grid_hw`` is the
    static output buffer shape; pixels past origin_hw are dead."""
    from .device_aug import letterbox_resize_one

    ih, iw = out_size
    gh, gw = grid_hw
    # nhw: host-f64 resized extents (fetch's nhw[4]) — the device f32
    # floor diverges for ~6% of sizes (letterbox_resize_one docstring)
    cp_img, s = letterbox_resize_one(tile, hw, (ih, iw), nhw=nhw)
    cp_img = jnp.round(cp_img)                       # host buffer is uint8

    tw2, th2 = jit_tw2.astype(jnp.int32), jit_th2.astype(jnp.int32)
    sy = th2.astype(jnp.float32) / ih
    sx = tw2.astype(jnp.float32) / iw

    yy = jnp.arange(gh, dtype=jnp.float32) + y_off.astype(jnp.float32)
    xx = jnp.arange(gw, dtype=jnp.float32) + x_off.astype(jnp.float32)
    # flip happens on the resized (th2, tw2) image: column c reads tw2-1-c
    xx = jnp.where(flip > 0, (tw2 - 1).astype(jnp.float32) - xx, xx)
    live = ((yy < th2.astype(jnp.float32))[:, None]
            & (xx >= 0)[None, :] & (xx < tw2.astype(jnp.float32))[None, :])
    live = live & ((jnp.arange(gh) < origin_hw[0])[:, None]
                   & (jnp.arange(gw) < origin_hw[1])[None, :])

    py = (yy + 0.5) / sy - 0.5
    px = (xx + 0.5) / sx - 0.5
    y0f, x0f = jnp.floor(py), jnp.floor(px)
    wy = jnp.clip(py - y0f, 0.0, 1.0)
    wx = jnp.clip(px - x0f, 0.0, 1.0)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, ih - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, ih - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, iw - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, iw - 1)
    rows = (cp_img[y0] * (1.0 - wy)[:, None, None]
            + cp_img[y1] * wy[:, None, None])
    out = (rows[:, x0] * (1.0 - wx)[None, :, None]
           + rows[:, x1] * wx[None, :, None])
    out = jnp.where(live[..., None], jnp.round(out), 114.0)
    return out, s, tw2


def _mixup_boxes(boxes, s, jit_scale, flip, tw2, x_off, y_off, origin_hw):
    """Partner label math (mosaic.py:198-207): scale by s*jit, flip about
    the resized width, shift by the crop offsets, clip to the ORIGIN
    image's (ow, oh), w/h>1 keep mask."""
    oh = origin_hw[0].astype(jnp.float32)
    ow = origin_hw[1].astype(jnp.float32)
    scale = s * jit_scale
    b = boxes * scale
    fx1 = tw2.astype(jnp.float32) - b[:, 2]
    fx2 = tw2.astype(jnp.float32) - b[:, 0]
    b = jnp.where(flip > 0,
                  jnp.stack([fx1, b[:, 1], fx2, b[:, 3]], axis=1), b)
    xo = x_off.astype(jnp.float32)
    yo = y_off.astype(jnp.float32)
    b = jnp.stack([jnp.clip(b[:, 0] - xo, 0, ow),
                   jnp.clip(b[:, 1] - yo, 0, oh),
                   jnp.clip(b[:, 2] - xo, 0, ow),
                   jnp.clip(b[:, 3] - yo, 0, oh)], axis=1)
    keep = ((b[:, 2] - b[:, 0] > 1) & (b[:, 3] - b[:, 1] > 1))
    return b, keep


# ---------------------------------------------------------------------------
# The fused per-item program
# ---------------------------------------------------------------------------

def _mosaic_one(tiles, hw, nhw, boxes, classes, nvalid, mrand,
                out_size: Tuple[int, int]):
    """One item: tiles (5, sh, sw, 3) uint8 — 4 mosaic tiles + 1 mixup
    partner — to (sh, sw, 3) f32 image buffer (mosaic result top-left,
    hw_out (ih, iw)) + xyxy boxes (5N, 4) + classes + nvalid, ready for
    device_aug.train_aug_batch.  When mrand[0] == 0 the item passes
    through untouched (tile 0 + its labels), covering mosaic_prob < 1."""
    ih, iw = out_size
    sh, sw = tiles.shape[1], tiles.shape[2]
    N = boxes.shape[1]
    use_mosaic = mrand[0] > 0
    yc = mrand[1].astype(jnp.int32)
    xc = mrand[2].astype(jnp.int32)
    m = mrand[3:9]

    canvas, (s, padw, padh) = compose_canvas(
        tiles[:4].astype(jnp.float32), hw[:4], nhw[:4], yc, xc, (ih, iw))
    warped = affine_warp(canvas, m, (iw, ih))      # (ih, iw, 3)

    # labels: tile boxes -> canvas coords (adjust_box_anns, mosaic.py:23-28)
    slot = jnp.arange(N)
    mos_boxes, mos_cls, mos_valid = [], [], []
    for t in range(4):
        b = boxes[t] * s[t]
        b = jnp.stack([jnp.clip(b[:, 0] + padw[t], 0, 2 * iw),
                       jnp.clip(b[:, 1] + padh[t], 0, 2 * ih),
                       jnp.clip(b[:, 2] + padw[t], 0, 2 * iw),
                       jnp.clip(b[:, 3] + padh[t], 0, 2 * ih)], axis=1)
        mos_boxes.append(b)
        mos_cls.append(classes[t])
        mos_valid.append(slot < nvalid[t])
    mb = affine_boxes(jnp.concatenate(mos_boxes, 0), m, (iw, ih))
    mc = jnp.concatenate(mos_cls, 0)
    mv = jnp.concatenate(mos_valid, 0)

    # ---- origin select: mosaic result (top-left of the buffer) or the
    # raw tile 0 passthrough (mosaic gate failed, mosaic.py:104-108) -----
    placed = jnp.full((sh, sw, 3), 114.0, jnp.float32)
    placed = jax.lax.dynamic_update_slice(placed, warped, (0, 0, 0))
    raw = tiles[0].astype(jnp.float32)
    mid = jnp.where(use_mosaic, placed, raw)
    hw_mid = jnp.where(use_mosaic,
                       jnp.asarray([ih, iw], jnp.int32), hw[0])

    raw_boxes = jnp.concatenate([boxes[0], jnp.zeros((3 * N, 4))], 0)
    raw_cls = jnp.concatenate([classes[0], jnp.zeros((3 * N,))], 0)
    raw_valid = jnp.concatenate(
        [slot < nvalid[0], jnp.zeros((3 * N,), bool)], 0)
    ob = jnp.where(use_mosaic, mb, raw_boxes)
    oc = jnp.where(use_mosaic, mc, raw_cls)
    ov = jnp.where(use_mosaic, mv, raw_valid)

    # ---- mixup (mosaic.py:110-112: applies to BOTH origins; the host
    # gate — enable flags, len(labels) > 0, prob draw — is folded into
    # mrand[9] host-side) ------------------------------------------------
    use_mixup = mrand[9] > 0
    cp, s5, tw2 = _mixup_partner(tiles[4].astype(jnp.float32), hw[4],
                                 (ih, iw), (sh, sw), hw_mid, mrand[10],
                                 mrand[11], mrand[12], mrand[13],
                                 mrand[14], mrand[15], nhw=nhw[4])
    mixed = jnp.floor(0.5 * mid + 0.5 * cp)        # host .astype(uint8)
    img = jnp.where(use_mixup, mixed, mid)
    pb, pkeep = _mixup_boxes(boxes[4], s5, mrand[10], mrand[11], tw2,
                             mrand[12], mrand[13], hw_mid)
    pv = use_mixup & pkeep & (slot < nvalid[4])
    # host drops the partner labels entirely when none survive the keep
    # mask (mosaic.py:206); masking does that for free.

    fb = jnp.concatenate([ob, pb], 0)              # (5N, 4)
    fc = jnp.concatenate([oc, classes[4]], 0)
    fv = jnp.concatenate([ov, pv], 0)
    hw_out = hw_mid

    # stable front-compaction (tile order = host concat order)
    order = jnp.argsort(~fv, stable=True)
    fb = fb[order]
    fc = fc[order]
    n_out = fv.sum().astype(jnp.int32)
    live = jnp.arange(5 * N) < n_out
    fb = jnp.where(live[:, None], fb, 0.0)
    fc = jnp.where(live, fc, 0.0)
    return img, hw_out, fb, fc, n_out


class DeviceMosaicDataset:
    """Host side of the device-mosaic path: pulls the 4 mosaic tiles + the
    mixup partner RAW (decode only) and draws every random in the EXACT
    call order of MosaicDetection.fetch (mosaic.py:96-117), so one seeded
    per-item rng produces identical augmentation through either path.

    fetch returns (tiles[5], hws[5], targets[5], mrand, tt_randoms, info,
    img_id); make_mosaic_collate packs them into mosaic_mixup_batch's
    static buffers."""

    def __init__(self, dataset, img_size: Tuple[int, int],
                 degrees: float = 10.0, translate: float = 0.1,
                 mosaic_scale=(0.5, 1.5), mixup_scale=(0.5, 1.5),
                 shear: float = 2.0, enable_mixup: bool = True,
                 mosaic_prob: float = 1.0, mixup_prob: float = 1.0,
                 mosaic: bool = True, hsv_prob: float = 1.0, rng=None):
        import random as _random

        self._dataset = dataset
        self.rng = rng or _random
        self.input_dim = tuple(img_size)
        self.degrees = degrees
        self.translate = translate
        self.scale = mosaic_scale
        self.mixup_scale = mixup_scale
        self.shear = shear
        self.enable_mosaic = mosaic
        self.enable_mixup = enable_mixup
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.hsv_prob = hsv_prob

    def __len__(self):
        return len(self._dataset)

    def close_mosaic(self):
        self.enable_mosaic = False
        self.enable_mixup = False

    def _ann_count(self, idx: int) -> int:
        return len(self._dataset.annotations[idx][0])

    def fetch(self, index, rng=None):
        from .device_aug import draw_randoms

        rng = rng or self.rng
        if isinstance(index, tuple):
            self.enable_mosaic, index = index
        ih, iw = self.input_dim
        mrand = np.zeros((N_MOSAIC_RANDOMS,), np.float32)
        tiles, hws, targets = [], [], []

        use_mosaic = (self.enable_mosaic
                      and rng.random() < self.mosaic_prob)
        if use_mosaic:
            mrand[0] = 1.0
            mrand[1] = int(rng.uniform(0.5 * ih, 1.5 * ih))   # yc
            mrand[2] = int(rng.uniform(0.5 * iw, 1.5 * iw))   # xc
            indices = [index] + [rng.randint(0, len(self._dataset) - 1)
                                 for _ in range(3)]
            img_info, img_id = (ih, iw), None
            for pos, idx in enumerate(indices):
                img, labels, info, iid = self._dataset.pull_item(idx)
                if pos == 0:
                    img_info, img_id = info, iid
                tiles.append(img)
                hws.append(img.shape[:2])
                targets.append(labels)
            mrand[3:9] = get_affine_params(
                (iw, ih), self.degrees, self.translate, self.scale,
                self.shear, rng)
            n_labels = sum(len(t) for t in targets)
        else:
            self._dataset.img_size = self.input_dim
            img, labels, img_info, img_id = self._dataset.pull_item(index)
            tiles = [img] + [np.zeros((1, 1, 3), np.uint8)] * 3
            hws = [img.shape[:2], (1, 1), (1, 1), (1, 1)]
            targets = [labels, np.zeros((0, 5), np.float32)] + \
                [np.zeros((0, 5), np.float32)] * 2
            n_labels = len(labels)

        # mixup gate: mosaic.py:110-112 — note it keys on the enable flags
        # and the post-mosaic label count, NOT on the mosaic prob draw
        use_mixup = (self.enable_mosaic and self.enable_mixup
                     and n_labels > 0
                     and rng.random() < self.mixup_prob)
        partner = np.zeros((1, 1, 3), np.uint8)
        p_labels = np.zeros((0, 5), np.float32)
        if use_mixup:
            mrand[9] = 1.0
            jit = rng.uniform(*self.mixup_scale)
            mrand[10] = jit
            mrand[11] = 1.0 if rng.random() > 0.5 else 0.0    # flip
            # resample-until-labels (mosaic.py:170-174): only the randint
            # consumes rng, so the annotation-count check needs no decode
            p_idx = None
            for _ in range(50):
                cand = rng.randint(0, len(self._dataset) - 1)
                if self._ann_count(cand) > 0:
                    p_idx = cand
                    break
            if p_idx is None:
                mrand[9] = 0.0                                # host returns
            else:
                partner, p_labels, _, _ = self._dataset.pull_item(p_idx)
                tw2, th2 = int(iw * jit), int(ih * jit)       # host f64
                mrand[14], mrand[15] = tw2, th2
                oh, ow = ((ih, iw) if use_mosaic
                          else tiles[0].shape[:2])
                pad_w, pad_h = max(tw2, ow), max(th2, oh)
                mrand[12] = (rng.randint(0, pad_w - ow)
                             if pad_w > ow else 0)             # x_off
                mrand[13] = (rng.randint(0, pad_h - oh)
                             if pad_h > oh else 0)             # y_off
        tiles.append(partner)
        hws.append(partner.shape[:2])
        targets.append(p_labels)

        # resized tile sizes int(h*s) in host f64 (see compose_canvas);
        # row 4 is the mixup partner's FIRST letterbox extents — the
        # device-side f32 floor diverges from the host's f64 int for ~6%
        # of (h, w) pairs (letterbox_resize_one docstring)
        nhw = np.zeros((5, 2), np.int32)
        for t in range(5):
            h0, w0 = hws[t]
            s = min(ih / h0, iw / w0)
            nhw[t] = (int(h0 * s), int(w0 * s))

        tt_randoms = draw_randoms(rng, 1, self.hsv_prob)[0]
        return tiles, hws, nhw, targets, mrand, tt_randoms, img_info, img_id


_TRUNC_WARNED = [False]


def make_mosaic_collate(src_size: Tuple[int, int], max_boxes: int = 120):
    """Collate DeviceMosaicDataset items into mosaic_mixup_batch's static
    buffers.  Returns (batch_dict, None, infos, ids); the dict's key set
    tells Trainer._next_batch to run the mosaic program before the
    TrainTransform program."""
    sh, sw = src_size

    def collate(items):
        b = len(items)
        tiles = np.zeros((b, 5, sh, sw, 3), np.uint8)
        hw = np.zeros((b, 5, 2), np.int32)
        nhw = np.zeros((b, 5, 2), np.int32)
        boxes = np.zeros((b, 5, max_boxes, 4), np.float32)
        classes = np.zeros((b, 5, max_boxes), np.float32)
        nvalid = np.zeros((b, 5), np.int32)
        mrand = np.zeros((b, N_MOSAIC_RANDOMS), np.float32)
        tt = np.zeros((b, items[0][5].shape[0]), np.float32)
        infos, ids = [], []
        for i, (t5, hw5, nhw5, tg5, mr, ttr, info, iid) in enumerate(items):
            for t in range(5):
                h = min(t5[t].shape[0], sh)
                w = min(t5[t].shape[1], sw)
                tiles[i, t, :h, :w] = t5[t][:h, :w]
                hw[i, t] = (h, w)
                n = min(len(tg5[t]), max_boxes)
                if len(tg5[t]) > max_boxes and not _TRUNC_WARNED[0]:
                    # no silent caps: the host mosaic keeps every tile box
                    _TRUNC_WARNED[0] = True
                    print(f"[device_mosaic] WARNING: tile with "
                          f"{len(tg5[t])} boxes truncated to max_boxes="
                          f"{max_boxes} (raise exp.device_mosaic_max_boxes "
                          f"to keep host parity on crowded images)",
                          flush=True)
                if n:
                    boxes[i, t, :n] = tg5[t][:n, :4]
                    classes[i, t, :n] = tg5[t][:n, 4]
                nvalid[i, t] = n
            nhw[i] = nhw5
            mrand[i] = mr
            tt[i] = ttr
            infos.append(info)
            ids.append(iid)
        batch = {"mosaic_tiles": tiles, "hw5": hw, "nhw5": nhw,
                 "boxes5": boxes, "classes5": classes, "nvalid5": nvalid,
                 "mrand": mrand, "randoms": tt}
        return batch, None, infos, ids

    return collate


@functools.partial(jax.jit, static_argnames=("out_size", "chunk"))
def mosaic_mixup_batch(tiles_u8, hw, nhw, boxes_xyxy, classes, nvalid,
                       mrand, out_size: Tuple[int, int], chunk: int = 8):
    """Batched jitted mosaic+affine+mixup.

    tiles_u8: (B, 5, sh, sw, 3) uint8   hw/nhw: (B, 5, 2) int32
    boxes_xyxy: (B, 5, N, 4) f32        classes: (B, 5, N) f32
    nvalid: (B, 5) int32                mrand: (B, N_MOSAIC_RANDOMS) f32
    -> images (B, sh, sw, 3) f32, hw (B, 2) i32, boxes (B, 5N, 4),
       classes (B, 5N), nvalid (B,)

    The batch runs in lax.map chunks so the (2H, 2W) canvases and pass
    intermediates never exist for more than ``chunk`` items at once.
    Batches not divisible by ``chunk`` are padded up to the next multiple
    (padded rows compute garbage that is sliced off) — the memory bound
    holds for EVERY batch size, not just multiples of the chunk.
    """
    B = tiles_u8.shape[0]
    fn = jax.vmap(functools.partial(_mosaic_one, out_size=out_size))
    c = min(chunk, B)
    if c <= 1 or B <= c:
        return fn(tiles_u8, hw, nhw, boxes_xyxy, classes, nvalid, mrand)

    def _chunk(args):
        return fn(*args)

    pad = (-B) % c
    arrays = (tiles_u8, hw, nhw, boxes_xyxy, classes, nvalid, mrand)
    if pad:
        # repeat the last item (not zeros: zero hw would divide by zero
        # inside the padded lanes) — padded outputs are sliced off below
        arrays = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], 0), arrays)
    parts = jax.tree_util.tree_map(
        lambda x: x.reshape(((B + pad) // c, c) + x.shape[1:]), arrays)
    out = jax.lax.map(_chunk, parts)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((B + pad,) + x.shape[2:])[:B], out)
