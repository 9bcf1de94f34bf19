"""Post-training int8 quantization (PTQ) for the fused/slim inference zoo.

The reference's identity is compression — channel pruning + storage tricks
(ref 01_mask_generator.py:10-46, 03_jh_merge.py) — but it never touches the
quantization axis.  On TPU that axis is where the silicon pays out: the MXU
executes s8 x s8 -> s32 at twice the bf16 rate, and int8 weights halve HBM
traffic.  This module adds the missing piece as an offline transform over
the deployment (BN-folded, optionally channel-slimmed) checkpoint:

  1. ``calibrate``       — run N batches through the fused model built with
     ``quant="calib"``; every quantizable conv sows its input absmax into
     the ``quant_stats`` collection (models/blocks.py Conv2d).
  2. ``build_quant_tree``— turn the stats into per-conv activation scales
     (absmax / 127, per-tensor symmetric).
  3. ``quantize_weights``— per-out-channel symmetric int8 kernels
     (scale = absmax over (kh, kw, cin) / 127); biases stay float.
  4. apply with the model built with ``quant="w8a8"`` and the combined
     ``quant`` collection: activations quantize per-tensor at each conv,
     the conv runs in int8, one float rescale after.

Scope: ConvBnAct convs in fused topology only (backbone + FPN + head
towers).  The final head prediction convs (reg/obj/cls 1x1, raw Conv2d
without BN) stay bf16 — they are output-quality-critical and a rounding
error there moves boxes directly.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def calibrate(model, variables: Dict, batches: Iterable) -> Dict:
    """Run calibration batches through a ``quant="calib"`` model; returns
    the accumulated ``quant_stats`` collection (per-conv input absmax)."""
    stats = None
    for images in batches:
        _, mut = model.apply(dict(variables), images,
                             mutable=["quant_stats"])
        batch_stats = mut["quant_stats"]
        if stats is None:
            stats = batch_stats
        else:
            stats = jax.tree_util.tree_map(
                lambda a, b: jnp.maximum(a, b), stats, batch_stats)
    assert stats is not None, "calibrate needs at least one batch"
    return jax.device_get(stats)


def build_quant_tree(stats: Dict, per_channel_act: bool = False) -> Dict:
    """quant_stats (sown per-input-channel absmax vectors) -> ``quant``
    collection with per-conv ``act_scale`` leaves.

    per_channel_act=False (default, the round-3 recipe): one scalar scale
    per conv — max over the channel vector, identical to the old
    whole-tensor absmax.  per_channel_act=True: keep the (cin,) vector so
    narrow-range channels don't lose resolution to one hot channel;
    ``quantize_weights`` folds the vector into the kernel so the conv
    still runs as a single s8 x s8 -> s32 op with a per-cout rescale.
    """
    flat = flatten_dict(stats)
    out = {}
    for path, val in flat.items():
        # sow stores ("act_absmax",) tuples; path ends (..., "conv",
        # "act_absmax")
        if path[-1] != "act_absmax":
            continue
        # sow with reduce_fn stores the reduced (cin,) vector directly
        absmax = np.asarray(jax.device_get(val), np.float32)
        if absmax.ndim > 1:  # defensively collapse any stacked leading axis
            absmax = absmax.max(axis=tuple(range(absmax.ndim - 1)))
        scope = path[:-1]
        # The Focus stem stays per-tensor even in per-channel mode: its
        # input is the raw image (uniform range, nothing to gain) and a
        # vector scale there would break the exact stem6 rewrite
        # (ops/fuse.py fold_focus_stem re-homes the scale onto the
        # 3-channel image input, where a 4c vector cannot follow).
        is_focus_stem = scope[:3] == ("backbone", "backbone", "stem")
        if per_channel_act and absmax.ndim and not is_focus_stem:
            out[scope + ("act_scale",)] = jnp.asarray(
                np.maximum(absmax, 1e-8) / 127.0, jnp.float32)
        else:
            out[scope + ("act_scale",)] = jnp.float32(
                max(float(np.max(absmax)), 1e-8) / 127.0)
    return unflatten_dict(out)


def _mse_clip_scales(kernel: np.ndarray, absmax: np.ndarray, qmax: int,
                     grid=tuple(np.linspace(0.3, 1.0, 29))) -> np.ndarray:
    """Per-out-channel scale minimizing quantization MSE over a clip grid.

    absmax/qmax scaling is the MSE-optimal choice only when the grid is
    fine (int8); at int4 the 15-level grid spends most of its range on
    the kernel's outlier tail and the measured accuracy collapses
    (w4a8 absmax on the r5 chain: AP50 0.7895 -> 0.6097).  Clipping the
    tail (scale = c * absmax / qmax, c < 1) trades a few saturated
    outliers for a 2x-finer grid over the bulk — the standard low-bit
    PTQ fix.  Deterministic, offline, per-channel."""
    flat = kernel.reshape(-1, kernel.shape[-1])            # (N, cout)
    best_scale = np.maximum(absmax, 1e-8) / qmax
    q = np.clip(np.round(flat / best_scale), -qmax, qmax)
    best_err = ((flat - q * best_scale) ** 2).sum(axis=0)
    for c in grid[:-1]:                                    # 1.0 == absmax
        s = np.maximum(absmax * c, 1e-8) / qmax
        q = np.clip(np.round(flat / s), -qmax, qmax)
        e = ((flat - q * s) ** 2).sum(axis=0)
        better = e < best_err
        best_scale = np.where(better, s, best_scale)
        best_err = np.where(better, e, best_err)
    return best_scale


def quantize_weights(variables: Dict, quant_tree: Dict, bits: int = 8,
                     clip_search: bool = None,
                     w8_keep_patterns: Tuple[str, ...] = (),
                     w8_keep_frac: float = 0.0) -> Tuple[Dict, Dict]:
    """Per-out-channel symmetric int-``bits`` quantization of every conv
    kernel that has a calibrated ``act_scale``.  Returns (new variables with
    int8 kernels, quant collection carrying w_scale + act_scale).

    ``bits=4`` (w4a8) narrows the weight grid to [-7, 7] with
    ``w_scale = absmax / 7`` while KEEPING the runtime dtype int8: the MXU
    conv is still one s8 x s8 -> s32 op with the exact same graph — only
    the per-out-channel scale changes, so every w8a8 consumer
    (models/blocks.py, export, serving) works unchanged.  The 2x payoff is
    storage: ``pack_int4_tree`` packs the nibble-range kernels two-per-byte
    for the checkpoint, extending the reference's sparse-storage identity
    (ref 03_jh_merge.py storage trick) one axis further.

    clip_search: per-out-channel MSE-optimal clip scaling instead of plain
    absmax (see _mse_clip_scales).  Default: on for bits=4 (absmax at int4
    is a measured accuracy disaster), off for bits=8 (absmax is already
    near-optimal there and it keeps the established w8a8 recipe
    bit-identical).

    w8_keep_patterns: mixed-precision escape hatch for bits=4 — any conv
    whose "/"-joined path contains one of these substrings keeps the full
    int8 grid (e.g. ("head/", "stem") protects the detection heads +
    stems, the classic low-bit-sensitive layers, for ~19% of the storage
    win).  Each conv's actual width is recorded as a ``w_bits`` leaf in
    the returned quant tree so callers pack exactly the nibble-grid set.

    w8_keep_frac: data-driven mixed precision for bits=4 — additionally
    keep the given fraction of convs with the WORST relative int4
    quantization MSE (after clip search) on the int8 grid.  Complements
    the name-based keeps: patterns encode task sensitivity (heads decode
    boxes), the frac rescues whichever kernels the nibble grid physically
    represents worst."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if clip_search is None:
        clip_search = bits == 4

    frac_keep: set = set()
    if bits == 4 and w8_keep_frac > 0.0:
        flat0 = flatten_dict(variables["params"])
        qflat0 = flatten_dict(quant_tree)
        rel_err = {}
        for path in qflat0:
            if path[-1] != "act_scale":
                continue
            kpath = path[:-1] + ("kernel",)
            k = np.asarray(flat0[kpath], np.float32)
            # Rank on the SAME tensor the main loop quantizes: with
            # per-channel act scales the a_scale is folded into the kernel
            # before quantization, so the "worst relative error" set must
            # be computed on the folded kernel too (ADVICE r4).
            a = np.asarray(qflat0[path], np.float32)
            if a.ndim and k.shape[2] != a.shape[0]:
                a = a.max()  # grouped/depthwise: per-tensor collapse
            if a.ndim:
                k = k * a[None, None, :, None]
            absmax = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-8)
            s = (_mse_clip_scales(k, absmax, 7) if clip_search
                 else absmax / 7.0)
            q = np.clip(np.round(k.reshape(-1, k.shape[-1]) / s), -7, 7)
            err = ((k.reshape(-1, k.shape[-1]) - q * s) ** 2).sum()
            rel_err[kpath] = float(err / max((k ** 2).sum(), 1e-12))
        n_keep = int(round(len(rel_err) * w8_keep_frac))
        frac_keep = set(sorted(rel_err, key=rel_err.get)[-n_keep:]
                        if n_keep else [])

    params = dict(flatten_dict(variables["params"]))
    qflat = dict(flatten_dict(quant_tree))
    for path in list(qflat):
        if path[-1] != "act_scale":
            continue
        scope = path[:-1]  # ends with (..., "conv")
        kpath = scope + ("kernel",)
        name = "/".join(kpath)
        keep8 = bits == 4 and (
            any(pat in name for pat in w8_keep_patterns)
            or kpath in frac_keep)
        qmax = 127 if (bits == 8 or keep8) else 7
        kbits = 8 if (bits == 8 or keep8) else 4
        kernel = np.asarray(params[kpath], np.float32)
        a_scale = np.asarray(qflat[path], np.float32)
        if a_scale.ndim and kernel.shape[2] != a_scale.shape[0]:
            # grouped/depthwise conv: kernel's cin axis is cin/groups, so a
            # per-channel fold doesn't factor — collapse to per-tensor.
            a_scale = a_scale.max()
            qflat[path] = jnp.float32(a_scale)
        if a_scale.ndim:
            # Fold the per-channel activation scale into the kernel BEFORE
            # per-cout quantization: conv(x/s_c, W*s_c) == conv(x, W), so
            # the runtime rescale stays per-out-channel (blocks.py w8a8).
            kernel = kernel * a_scale[None, None, :, None]
        absmax = np.abs(kernel).max(axis=(0, 1, 2))  # per out channel
        if clip_search and kbits == 4:
            w_scale = _mse_clip_scales(kernel, absmax, qmax)
        else:
            w_scale = np.maximum(absmax, 1e-8) / qmax
        q = np.clip(np.round(kernel / w_scale), -qmax, qmax).astype(np.int8)
        params[kpath] = jnp.asarray(q)
        qflat[scope + ("w_scale",)] = jnp.asarray(w_scale, jnp.float32)
        if bits == 4:
            qflat[scope + ("w_bits",)] = jnp.int32(kbits)
    new_vars = dict(variables)
    new_vars["params"] = unflatten_dict(params)
    return new_vars, unflatten_dict(qflat)


_INT4_DATA = "__int4_packed__"
_INT4_SHAPE = "__int4_shape__"


def pack_int4_tree(params: Dict, kernel_paths=None) -> Dict:
    """Pack int4-storage kernels two values per byte for checkpoint
    storage.  Each packed leaf becomes a
    ``{_INT4_DATA: uint8[ceil(n/2)], _INT4_SHAPE: int32[ndim]}`` subtree;
    ``unpack_int4_tree`` (called transparently by
    utils.checkpoint.load_checkpoint) restores the exact int8 array.

    ``kernel_paths`` (a set of flattened-dict path tuples) DECLARES which
    leaves were quantized with bits=4 — pass it (quantize_model.py derives
    it from the quant collection) so the on-disk format is deterministic
    for a given --bits setting rather than data-dependent.  Leaves named
    in it must be nibble-range int8 (asserted).  Without it, falls back to
    packing every int8 leaf whose values happen to fit [-8, 7]."""
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if kernel_paths is not None:
            packable = path in kernel_paths
            if packable and not (arr.dtype == np.int8 and
                                 (not arr.size or
                                  (arr.min() >= -8 and arr.max() <= 7))):
                raise ValueError(
                    f"pack_int4_tree: {'/'.join(map(str, path))} was "
                    "declared int4 but is not a nibble-range int8 leaf")
        else:
            packable = (arr.dtype == np.int8 and arr.size
                        and arr.min() >= -8 and arr.max() <= 7)
        if packable and arr.size:
            v = arr.ravel()
            if v.size % 2:
                v = np.concatenate([v, np.zeros(1, np.int8)])
            nib = (v.astype(np.uint8)) & 0xF  # two's-complement nibbles
            packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
            out[path + (_INT4_DATA,)] = packed
            out[path + (_INT4_SHAPE,)] = np.asarray(arr.shape, np.int32)
        else:
            out[path] = leaf
    return unflatten_dict(out)


def unpack_int4_tree(tree: Dict) -> Dict:
    """Inverse of ``pack_int4_tree``: restores int8 arrays (sign-extending
    each nibble) at every packed node; a tree with no packed nodes passes
    through unchanged."""
    flat = flatten_dict(tree)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == _INT4_SHAPE:
            if path[:-1] + (_INT4_DATA,) not in flat:
                raise ValueError(
                    "corrupt int4-packed checkpoint: orphan "
                    f"{_INT4_SHAPE} at {'/'.join(map(str, path[:-1]))} "
                    f"(no {_INT4_DATA} sibling)")
            continue
        if path[-1] == _INT4_DATA:
            spath = path[:-1] + (_INT4_SHAPE,)
            if spath not in flat:
                raise ValueError(
                    "corrupt int4-packed checkpoint: "
                    f"{'/'.join(map(str, path[:-1]))} has {_INT4_DATA} "
                    f"but no {_INT4_SHAPE} sibling (truncated save?)")
            shape = tuple(int(s) for s in np.asarray(flat[spath]))
            packed = np.asarray(leaf, np.uint8)
            nib = np.empty(packed.size * 2, np.uint8)
            nib[0::2] = packed & 0xF
            nib[1::2] = packed >> 4
            v = ((nib ^ 8).astype(np.int16) - 8).astype(np.int8)  # sign-ext
            n = int(np.prod(shape)) if shape else 1
            out[path[:-1]] = v[:n].reshape(shape)
        else:
            out[path] = leaf
    return unflatten_dict(out)


def tree_has_int4(tree: Dict) -> bool:
    return any(path[-1] == _INT4_DATA for path in flatten_dict(tree))


def quantize_model(calib_model, variables: Dict,
                   calib_batches: Iterable,
                   per_channel_act: bool = False,
                   bits: int = 8, clip_search: bool = None,
                   w8_keep_patterns: Tuple[str, ...] = (),
                   w8_keep_frac: float = 0.0) -> Dict:
    """One-call PTQ: calibrate on ``calib_model`` (built with
    quant="calib"), quantize weights, and return the full variable tree
    (params with int8 kernels + the "quant" collection) ready for a model
    built with quant="w8a8").  ``per_channel_act=True`` uses per-input-
    channel activation scales (folded into the kernel — same runtime graph
    shape, finer quantization grid).  ``bits=4`` produces w4a8 nibble-range
    kernels (see quantize_weights) that pack_int4_tree can halve on disk."""
    stats = calibrate(calib_model, variables, calib_batches)
    qtree = build_quant_tree(stats, per_channel_act=per_channel_act)
    qvars, quant = quantize_weights(variables, qtree, bits=bits,
                                    clip_search=clip_search,
                                    w8_keep_patterns=w8_keep_patterns,
                                    w8_keep_frac=w8_keep_frac)
    qvars["quant"] = quant
    return qvars


def quantization_report(variables: Dict, bits: int = 8) -> Dict[str, Any]:
    """Byte accounting: quantized vs float parameter footprint.  ``bits``
    is the STORAGE width of the int8-dtype kernels (4 when the checkpoint
    will be packed with pack_int4_tree).  bits=4 accounting matches
    pack_int4_tree exactly: ceil(n/2) data bytes + the int32 shape-
    metadata leaf per kernel.  Mixed-precision trees (w8_keep_patterns)
    carry per-conv ``w_bits`` leaves in the quant collection — when
    present they override the uniform ``bits`` for exact accounting."""
    flat = flatten_dict(variables["params"])
    kernel_bits = {}
    if "quant" in variables:
        for p, v in flatten_dict(variables["quant"]).items():
            if p[-1] == "w_bits":
                kernel_bits[p[:-1] + ("kernel",)] = int(v)

    def leaf_bytes(path, v):
        b = kernel_bits.get(path, bits)
        return (int(np.prod(v.shape)) * b + 7) // 8 \
            + (4 * v.ndim if b == 4 else 0)

    int8_bytes = sum(leaf_bytes(p, v) for p, v in flat.items()
                     if v.dtype == jnp.int8)
    float_bytes = sum(int(np.prod(v.shape)) * 4 for v in flat.values()
                      if v.dtype != jnp.int8)
    n_q = sum(1 for v in flat.values() if v.dtype == jnp.int8)
    return {"quantized_convs": n_q,
            "weight_bits": bits,
            "int8_bytes": int8_bytes,
            "float_bytes": float_bytes,
            "total_mb": (int8_bytes + float_bytes) / 2**20}
