"""On-device (XLA) train-time augmentation: letterbox + HSV + flip + label
padding + mixup as ONE jitted batched program.

Parity target: the host TrainTransform pipeline (transforms.py:148-191,
ref yolox/data/data_augment.py:21-31,136-160,163-212).  The host decodes
JPEGs and composes mosaics; everything after — the per-pixel work that
scales with input_size² — moves onto the TPU where it overlaps the train
step instead of serializing on the 1-core host (BASELINE.json north_star:
"mosaic, mixup, letterbox resize, HSV jitter moves on-device").

TPU design notes:
  * One fixed-shape program: raw images arrive padded to a static
    (src_h, src_w) buffer with their true (h, w) carried densely; all
    per-image scales are DYNAMIC values inside the jit (no recompiles
    across image sizes).
  * The letterbox resize is a hand-rolled separable bilinear gather with
    cv2.INTER_LINEAR semantics — half-pixel centers, edge clamping to the
    true (h-1, w-1) so the dead padding in the static buffer can never
    bleed into the output (jax.image.scale_and_translate would sample it).
  * Randomness comes in as a per-image vector drawn on the host from the
    same seeded python Random as the host path — the parity tests replay
    one RNG through both pipelines.
  * HSV jitter uses cv2's uint8 conventions (H in [0,180), S/V in
    [0,255]) in float math; pointwise, so it commutes with the flip and
    fuses into the gather program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-image random vector layout (drawn host-side, see draw_randoms):
#   [0] hsv gate draw       ~ U[0,1)   (jitter applied when < hsv_prob)
#   [1:4] hsv gain draws    ~ U[-1,1]  (scaled by hgain/sgain/vgain)
#   [4:7] hsv on/off draws  ∈ {0,1}    (host randint(0,1) per gain)
#   [7] flip draw           ~ U[0,1)   (mirrored when < flip_prob)
N_RANDOMS = 8


def draw_randoms(rng, n: int, hsv_prob: float = 1.0) -> np.ndarray:
    """Draw the (n, N_RANDOMS) random vector with the SAME call sequence
    the host TrainTransform uses per image (transforms.py:174-176 ordering:
    hsv gate, then 3 uniform gains + 3 on/off ints ONLY when the gate
    passes — the host consumes no gain draws otherwise — then the flip
    draw).  Drawing the gains unconditionally would shift the flip draw
    and desync the two pipelines whenever hsv_prob < 1."""
    out = np.zeros((n, N_RANDOMS), np.float32)
    for i in range(n):
        out[i, 0] = rng.random()
        if out[i, 0] < hsv_prob:
            out[i, 1:4] = [rng.uniform(-1, 1) for _ in range(3)]
            out[i, 4:7] = [rng.randint(0, 1) for _ in range(3)]
        out[i, 7] = rng.random()
    return out


# ---------------------------------------------------------------------------
# HSV jitter (cv2 uint8 conventions, float math)
# ---------------------------------------------------------------------------

def bgr_to_hsv(img):
    """BGR float [0,255] -> (h [0,180), s [0,255], v [0,255]) — the value
    ranges cv2.cvtColor(..., COLOR_BGR2HSV) uses for uint8 images."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    # hue in degrees/2 (cv2 packs 0..360 into 0..180 for uint8)
    h = jnp.where(
        v == r, (g - b) / safe * 30.0,
        jnp.where(v == g, (b - r) / safe * 30.0 + 60.0,
                  (r - g) / safe * 30.0 + 120.0))
    h = jnp.where(diff > 0, h % 180.0, 0.0)
    s = jnp.where(v > 0, diff / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    return h, s, v


def hsv_to_bgr(h, s, v):
    """Inverse of bgr_to_hsv (h in [0,180), s/v in [0,255])."""
    h6 = h / 30.0  # sector in [0, 6)
    c = v * (s / 255.0)
    x = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    sector = jnp.floor(h6).astype(jnp.int32) % 6
    r = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [c, x, 0.0, 0.0, x], c)
    g = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [x, c, c, x, 0.0], 0.0)
    b = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4], [0.0, 0.0, x, c, c], x)
    return jnp.stack([b + m, g + m, r + m], axis=-1)


def hsv_jitter(img, gains):
    """Random HSV shift (ref data_augment.py:21-31): h rolls mod 180,
    s/v clip to [0,255].  ``gains`` is (3,) — already gated/scaled."""
    h, s, v = bgr_to_hsv(img)
    # host TRUNCATES gains toward zero — gains.astype(np.int16),
    # transforms.py:46 — so 4.7 applies +4 and -4.7 applies -4
    g = jnp.trunc(gains)
    h = (h + g[0]) % 180.0
    s = jnp.clip(s + g[1], 0.0, 255.0)
    v = jnp.clip(v + g[2], 0.0, 255.0)
    out = hsv_to_bgr(h, s, v)
    # host path goes through uint8 after the jitter — round to match
    return jnp.clip(jnp.round(out), 0.0, 255.0)


# ---------------------------------------------------------------------------
# Letterbox: separable bilinear with cv2.INTER_LINEAR semantics
# ---------------------------------------------------------------------------

def _lin_weights(out_len: int, src_len, scale):
    """Sample positions for one axis: half-pixel centers, edge clamp.

    out coordinate o samples src at (o + 0.5)/scale - 0.5, like
    cv2.INTER_LINEAR with scale = new_len/src_len.  Returns (i0, i1, w1)
    with indices clamped to [0, src_len-1] (so static-buffer padding can
    never be sampled)."""
    o = jnp.arange(out_len, dtype=jnp.float32)
    src = (o + 0.5) / scale - 0.5
    i0f = jnp.floor(src)
    w1 = jnp.clip(src - i0f, 0.0, 1.0)
    hi = jnp.maximum(src_len - 1, 0)
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, hi)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, hi)
    # beyond the drawn region the values are don't-care (masked to 114)
    return i0, i1, w1


def letterbox_resize_one(img, hw, out_size: Tuple[int, int],
                         pad_value: float = 114.0, nhw=None):
    """Ratio-preserving resize + top-left pad of ONE image living in a
    static (src_h, src_w, 3) buffer with true size ``hw`` (host parity:
    transforms.py:138-145).  Returns (out, r).

    nhw: optional (2,) int32 resized extents int(h*r), int(w*r) computed
    HOST-side in f64.  Without it the extents come from f32 floor(h*r),
    which differs from the host's f64 int() for ~6% of (h, w) pairs when
    r != 1 (measured; the same hazard device_mosaic.py avoids by shipping
    nhw5 from the host) — pass nhw whenever out_size is known at collate
    time."""
    oh, ow = out_size
    h = hw[0].astype(jnp.float32)
    w = hw[1].astype(jnp.float32)
    r = jnp.minimum(oh / h, ow / w)
    # host: nw, nh = int(w*r), int(h*r); cv2 resizes with scale nw/w (not r)
    if nhw is None:
        nh = jnp.floor(h * r).astype(jnp.int32)
        nw = jnp.floor(w * r).astype(jnp.int32)
    else:
        nh, nw = nhw[0], nhw[1]
    sy = nh.astype(jnp.float32) / h
    sx = nw.astype(jnp.float32) / w

    y0, y1, wy = _lin_weights(oh, hw[0], sy)
    x0, x1, wx = _lin_weights(ow, hw[1], sx)

    img = img.astype(jnp.float32)
    # rows: (src_h, src_w, 3) -> (oh, src_w, 3)
    rows = (img[y0] * (1.0 - wy)[:, None, None]
            + img[y1] * wy[:, None, None])
    # cols: -> (oh, ow, 3)
    out = (rows[:, x0] * (1.0 - wx)[None, :, None]
           + rows[:, x1] * wx[None, :, None])

    yy = jnp.arange(oh)[:, None]
    xx = jnp.arange(ow)[None, :]
    live = (yy < nh) & (xx < nw)
    out = jnp.where(live[..., None], out, pad_value)
    return out, r


# ---------------------------------------------------------------------------
# Boxes
# ---------------------------------------------------------------------------

def xyxy2cxcywh(boxes):
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    c = boxes[..., 0:2] + wh * 0.5
    return jnp.concatenate([c, wh], axis=-1)


def _flip_boxes_xyxy(boxes, width):
    """Mirror xyxy boxes about the vertical axis (transforms.py:116:
    boxes[:, 0::2] = width - boxes[:, 2::-2])."""
    x1 = width - boxes[..., 2]
    x2 = width - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


# ---------------------------------------------------------------------------
# The fused per-image transform
# ---------------------------------------------------------------------------

def _train_aug_one(img_u8, hw, boxes_xyxy, classes, nvalid, randoms, nhw,
                   out_size: Tuple[int, int], max_labels: int,
                   flip_prob: float, hsv_prob: float,
                   hgain: float, sgain: float, vgain: float):
    """Device twin of TrainTransform.__call__ (transforms.py:162-191) for
    one image in a static buffer.  All control flow is data-independent
    (where/masks), so the whole batch vmaps into one program."""
    oh, ow = out_size
    img = img_u8.astype(jnp.float32)

    hsv_on = randoms[0] < hsv_prob
    gains = (randoms[1:4] * jnp.asarray([hgain, sgain, vgain])
             * randoms[4:7] * hsv_on)
    aug = hsv_jitter(img, gains)

    do_flip = randoms[7] < flip_prob
    # flip inside the static buffer = reverse the live [0, w) columns;
    # realized as a gather of column w-1-x clamped into the live region
    w = hw[1]
    src_w = img.shape[1]
    cols = jnp.arange(src_w)
    flip_cols = jnp.clip(w - 1 - cols, 0, src_w - 1)
    aug = jnp.where(do_flip, aug[:, flip_cols], aug)

    n = jnp.arange(boxes_xyxy.shape[0])
    valid = n < nvalid
    fboxes = jnp.where(do_flip,
                       _flip_boxes_xyxy(boxes_xyxy, w.astype(jnp.float32)),
                       boxes_xyxy)

    # degenerate-aug fallback (transforms.py:182-186): if scaling kills
    # every box, revert to the clean image + ALL original boxes.  Box
    # sizes don't depend on hsv/flip, so keep-mask equality with the host
    # path is exact.
    r_pre = jnp.minimum(oh / hw[0].astype(jnp.float32),
                        ow / hw[1].astype(jnp.float32))
    cxcywh = xyxy2cxcywh(fboxes) * r_pre
    keep = valid & (jnp.minimum(cxcywh[:, 2], cxcywh[:, 3]) > 1.0)
    # covers BOTH host early-returns: no boxes at all (transforms.py:168-170,
    # clean letterbox, no hsv/flip) and the degenerate-aug revert (:182-186)
    fallback = ~keep.any()

    use_img = jnp.where(fallback, img, aug)
    out, r = letterbox_resize_one(use_img, hw, out_size, nhw=nhw)

    final_boxes = jnp.where(fallback,
                            xyxy2cxcywh(boxes_xyxy) * r_pre, cxcywh)
    final_keep = jnp.where(fallback, valid, keep)

    # stable front-compaction into the (max_labels, 5) padded layout the
    # loss consumes (transforms.py:188-191)
    order = jnp.argsort(~final_keep, stable=True)[:max_labels]
    merged = jnp.concatenate([classes[:, None], final_boxes], axis=-1)
    gathered = merged[order]
    if gathered.shape[0] < max_labels:
        # box buffer narrower than the label budget (e.g. max_boxes <
        # max_labels_mosaic): pad so the output keeps the (max_labels, 5)
        # contract instead of crashing on the broadcast below
        gathered = jnp.pad(
            gathered, ((0, max_labels - gathered.shape[0]), (0, 0)))
    kcount = final_keep.sum()
    slot_live = jnp.arange(max_labels) < kcount
    labels = jnp.where(slot_live[:, None], gathered, 0.0)
    return out, labels


@functools.partial(
    jax.jit, static_argnames=("out_size", "max_labels", "flip_prob",
                              "hsv_prob", "hgain", "sgain", "vgain"))
def train_aug_batch(images_u8, hw, boxes_xyxy, classes, nvalid, randoms,
                    nhw=None,
                    out_size: Tuple[int, int] = (640, 640),
                    max_labels: int = 50,
                    flip_prob: float = 0.5, hsv_prob: float = 1.0,
                    hgain: float = 5.0, sgain: float = 30.0,
                    vgain: float = 30.0):
    """Batched jitted TrainTransform.

    images_u8: (B, src_h, src_w, 3) uint8 static buffer (top-left aligned)
    hw:        (B, 2) int32 true sizes
    boxes_xyxy:(B, N, 4) float32, classes: (B, N), nvalid: (B,) int32
    randoms:   (B, N_RANDOMS) float32 (draw_randoms)
    -> images (B, *out_size, 3) float32, labels (B, max_labels, 5)
    """
    fn = functools.partial(
        _train_aug_one, out_size=out_size, max_labels=max_labels,
        flip_prob=flip_prob, hsv_prob=hsv_prob, hgain=hgain, sgain=sgain,
        vgain=vgain)
    if nhw is None:
        fn_no = lambda i, h, b, c, n, rr: fn(i, h, b, c, n, rr, None)
        return jax.vmap(fn_no)(images_u8, hw, boxes_xyxy, classes, nvalid,
                               randoms)
    return jax.vmap(fn)(images_u8, hw, boxes_xyxy, classes, nvalid, randoms,
                        nhw)


@functools.partial(jax.jit, static_argnames=())
def mixup_batch(images_a, labels_a, images_b, labels_b):
    """0.5/0.5 mixup of two already-letterboxed batches with label union
    (ref mosaicdetection.py mixup: lam fixed at 0.5 in the competition
    recipe).  Labels are (B, L, 5) zero-padded; the union front-compacts
    a's labels then b's into a (B, 2L, 5) -> (B, L, 5) crop, matching the
    host path's concatenate-then-truncate."""
    imgs = 0.5 * images_a + 0.5 * images_b
    both = jnp.concatenate([labels_a, labels_b], axis=1)
    live = (both[..., 3] > 0) & (both[..., 4] > 0)
    order = jnp.argsort(~live, axis=1, stable=True)
    both = jnp.take_along_axis(both, order[..., None], axis=1)
    return imgs, both[:, : labels_a.shape[1]]


def mosaic_preproc_batch(batch, out_size: Tuple[int, int],
                         max_labels: int = 120, flip_prob: float = 0.5,
                         hsv_prob: float = 1.0):
    """Device-mosaic raw-buffer dict -> (imgs, labels): the mosaic+affine+
    mixup program feeding the TrainTransform program.  This IS the
    production composition — parity tests must call it too, or they drift
    from what the Trainer runs."""
    from .device_mosaic import mosaic_mixup_batch

    img_b, hw_b, boxes_b, cls_b, nv_b = mosaic_mixup_batch(
        batch["mosaic_tiles"], batch["hw5"], batch["nhw5"],
        batch["boxes5"], batch["classes5"], batch["nvalid5"],
        batch["mrand"], out_size=tuple(out_size))
    # final letterbox extents for train_aug_batch: mosaic items are
    # already exactly out_size (r=1), but PASSTHROUGH items (mosaic
    # gate failed, mrand[0] == 0) letterbox the raw tile-0 image —
    # their host-f64 extents are nhw5[:, 0] (tile 0 uses the same
    # min(ih/h, iw/w) ratio); the device f32 floor diverges for ~6%
    # of sizes, breaking host parity without this
    ih, iw = tuple(out_size)
    nhw_final = jnp.where(
        batch["mrand"][:, :1] > 0,
        jnp.asarray([ih, iw], jnp.int32)[None, :],
        batch["nhw5"][:, 0])
    return train_aug_batch(
        img_b, hw_b, boxes_b, cls_b, nv_b, batch["randoms"],
        nhw=nhw_final, out_size=tuple(out_size), max_labels=max_labels,
        flip_prob=flip_prob, hsv_prob=hsv_prob)


def apply_device_preproc(exp, input_size: Tuple[int, int], batch):
    """Run the on-device preprocessing program(s) on a raw-buffer batch
    dict produced by make_device_collate / make_mosaic_collate.

    Shared by Trainer._next_batch and tools/bench_train.py --loader so the
    measured pipeline IS the production pipeline.  Returns (imgs, labels)
    as float32 device arrays; dispatch is async, so the programs overlap
    the previous train step.
    """
    if "mosaic_tiles" in batch:
        return mosaic_preproc_batch(
            batch, tuple(input_size), max_labels=exp.max_labels_mosaic,
            flip_prob=exp.flip_prob, hsv_prob=exp.hsv_prob)
    return train_aug_batch(
        **batch, out_size=tuple(input_size),
        max_labels=exp.max_labels_mosaic,
        flip_prob=exp.flip_prob, hsv_prob=exp.hsv_prob)


class DeviceAugDataset:
    """Wraps MosaicDetection (built with ``preproc=None``) so fetch returns
    the RAW composed image + xyxy labels + the per-item random vector drawn
    from the SAME seeded rng the host path would use — the loader's
    per-item determinism guarantee carries over unchanged."""

    def __init__(self, inner, hsv_prob: float = 1.0):
        self._inner = inner
        self._hsv_prob = hsv_prob

    def __len__(self):
        return len(self._inner)

    def close_mosaic(self):
        self._inner.close_mosaic()

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def fetch(self, index, rng=None):
        import random as _random

        # default to the wrapped dataset's seeded rng (the stream the
        # inner mosaic draws already came from) — falling back to the
        # global module would split one item across two RNG streams
        rng = rng or getattr(self._inner, "rng", None) or _random
        img, labels, info, img_id = self._inner.fetch(index, rng)
        if len(labels) == 0:
            # host TrainTransform early-returns before ANY draw for
            # label-free images (transforms.py:168-170) — consume nothing;
            # gate draws of 1.0 make hsv and flip no-ops in-program
            randoms = np.asarray([1, 0, 0, 0, 0, 0, 0, 1], np.float32)
        else:
            randoms = draw_randoms(rng, 1, self._hsv_prob)[0]
        return img, labels, randoms, info, img_id


_PACK_WARNED = [False]


def pack_items(items, src_size: Tuple[int, int], max_boxes: int,
               out_size: Optional[Tuple[int, int]] = None):
    """Pack (img_u8, targets) pairs into train_aug_batch's static buffers.

    The one shared packer behind make_device_collate and DeviceTrainAug.
    When ``out_size`` is known, also returns the per-item resized extents
    nhw = int(h*r), int(w*r) computed here in host f64 — letterbox's f32
    floor diverges from the host for ~6% of sizes (letterbox_resize_one
    docstring)."""
    b = len(items)
    sh, sw = src_size
    imgs = np.zeros((b, sh, sw, 3), np.uint8)
    hw = np.zeros((b, 2), np.int32)
    boxes = np.zeros((b, max_boxes, 4), np.float32)
    classes = np.zeros((b, max_boxes), np.float32)
    nvalid = np.zeros((b,), np.int32)
    nhw = np.zeros((b, 2), np.int32)
    for i, (img, tg) in enumerate(items):
        if ((img.shape[0] > sh or img.shape[1] > sw)
                and not _PACK_WARNED[0]):
            # no silent caps: cropping pixels desyncs labels vs the host
            _PACK_WARNED[0] = True
            print(f"[device_aug] WARNING: {img.shape[0]}x{img.shape[1]} "
                  f"image cropped to the {sh}x{sw} static buffer (raise "
                  f"exp.device_aug_src_scale to keep host parity)",
                  flush=True)
        h = min(img.shape[0], sh)
        w = min(img.shape[1], sw)
        imgs[i, :h, :w] = img[:h, :w]
        hw[i] = (h, w)
        n = min(len(tg), max_boxes)
        if n:
            boxes[i, :n] = tg[:n, :4]
            classes[i, :n] = tg[:n, 4]
        nvalid[i] = n
        if out_size is not None:
            r = min(out_size[0] / h, out_size[1] / w)
            nhw[i] = (int(h * r), int(w * r))
    return imgs, hw, boxes, classes, nvalid, nhw


def make_device_collate(src_size: Tuple[int, int], max_boxes: int = 120,
                        out_size: Optional[Tuple[int, int]] = None):
    """Collate DeviceAugDataset items into the static train_aug_batch
    buffers.  Returns (batch_dict, None, infos, ids) — the dict transfers
    as a pytree through DevicePrefetcher (uint8 pixels: 4x less H2D
    traffic than the host-side float32 path)."""

    def collate(items):
        randoms = np.stack([it[2] for it in items]).astype(np.float32)
        infos = [it[3] for it in items]
        ids = [it[4] for it in items]
        imgs, hw, boxes, classes, nvalid, nhw = pack_items(
            [(it[0], it[1]) for it in items], src_size, max_boxes,
            out_size=out_size)
        batch = {"images_u8": imgs, "hw": hw, "boxes_xyxy": boxes,
                 "classes": classes, "nvalid": nvalid, "randoms": randoms}
        if out_size is not None:
            batch["nhw"] = nhw
        return batch, None, infos, ids

    return collate


class DeviceTrainAug:
    """Host-facing wrapper: collates raw (image, xyxy boxes) items into the
    static buffers and runs train_aug_batch on the accelerator.

    Drop-in alternative to attaching TrainTransform per item: the host
    loader yields raw decoded images; the per-pixel augmentation runs on
    device, overlapped with the train step via DevicePrefetcher."""

    def __init__(self, input_size: Tuple[int, int], src_size: Tuple[int, int],
                 max_labels: int = 50, max_boxes: int = 120,
                 flip_prob: float = 0.5, hsv_prob: float = 1.0):
        self.input_size = tuple(input_size)
        self.src_size = tuple(src_size)
        self.max_labels = max_labels
        self.max_boxes = max_boxes
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def collate(self, items, rng):
        """items: list of (img_u8 HWC, targets (n, 5) xyxy+cls). Returns the
        host-side numpy arrays for train_aug_batch."""
        imgs, hw, boxes, classes, nvalid, nhw = pack_items(
            items, self.src_size, self.max_boxes, out_size=self.input_size)
        randoms = draw_randoms(rng, len(items), self.hsv_prob)
        return imgs, hw, boxes, classes, nvalid, randoms, nhw

    def __call__(self, items, rng):
        (imgs, hw, boxes, classes, nvalid, randoms,
         nhw) = self.collate(items, rng)
        return train_aug_batch(
            imgs, hw, boxes, classes, nvalid, randoms, nhw,
            out_size=self.input_size, max_labels=self.max_labels,
            flip_prob=self.flip_prob, hsv_prob=self.hsv_prob)
