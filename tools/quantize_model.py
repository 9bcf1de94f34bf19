#!/usr/bin/env python3
"""Offline int8 PTQ over a fused/slim deployment checkpoint.

The last stage of the compression chain (after compress_pipeline --slim):
calibrate per-conv activation scales on a handful of real images, quantize
every ConvBnAct kernel to per-out-channel int8, and write a deployment
msgpack carrying the int8 params plus the "quant" scale collection.  The
harness consumes it with ``"quant": "w8a8"`` in the config
(harness/main.py build_model_and_vars).

Extends the reference's compression identity (ref 01_mask_generator.py,
03_jh_merge.py — pruning + sparse storage) to the quantization axis the
TPU MXU actually rewards; the reference never had an int8 path.

Usage:
  python tools/quantize_model.py -c outputs/.../pipe_merged_ckpt.msgpack \
      [--slim-spec outputs/.../pipe_slim_spec.json] \
      [--data-dir /path/to/calib/images | --synth] \
      [--img-size 640] [--calib-batches 4] [-b 8] \
      -o outputs/.../pipe_int8_ckpt.msgpack
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_parser():
    p = argparse.ArgumentParser("cocodet_tpu int8 PTQ")
    p.add_argument("-c", "--ckpt", required=True,
                   help="fused deployment .msgpack (compress_pipeline output)")
    p.add_argument("-o", "--out", required=True, help="output .msgpack")
    p.add_argument("-n", "--name", default="yolox-p6")
    p.add_argument("--depth", type=float, default=0.67)
    p.add_argument("--width", type=float, default=0.75)
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--slim-spec", default=None,
                   help="channel-slim spec json (if the ckpt is slimmed)")
    p.add_argument("--data-dir", default=None,
                   help="folder of calibration images (letterboxed like the "
                        "harness); defaults to --synth if absent")
    p.add_argument("--synth", action="store_true",
                   help="calibrate on synthetic scenes (tests/synthetic.py "
                        "generator) — the offline-data fallback")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--calib-batches", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the TPU tunnel alone)")
    p.add_argument("--act-scales", choices=["tensor", "channel"],
                   default="channel",
                   help="activation-scale granularity.  Default 'channel' "
                        "(per-input-channel, folded into the kernel: same "
                        "runtime graph, finer grid) is the round-4 "
                        "production recipe — throughput-neutral on the v5e "
                        "(2587.9 vs 2575.5 img/s) and recovers 70%% of the "
                        "int8 AP50 loss (0.7892 vs 0.7874, bf16 0.7900).  "
                        "'tensor' is the round-3 recipe.  QAT "
                        "(tools/qat_tune.py) fine-tunes either grid.")
    p.add_argument("--bits", type=int, choices=[8, 4], default=8,
                   help="weight storage width.  8 = w8a8 (production).  "
                        "4 = w4a8: kernels quantized to [-7, 7] and nibble-"
                        "packed in the output msgpack (2x smaller artifact); "
                        "the runtime graph is the SAME s8xs8->s32 w8a8 "
                        "program — load_checkpoint unpacks transparently.  "
                        "Measured (r4, 60%%-param slim chain, bf16 0.7900 "
                        "AP50): full w4 is a negative (absmax 0.6097, "
                        "MSE-clip 0.6944); the shipped recipe is "
                        "'--bits 4 --w4-keep-frac 0.4' = 0.7776 at 1.8 MB "
                        "vs w8a8's 0.7892 at 2.4 MB.")
    p.add_argument("--w4-keep", default=None,
                   help="mixed-precision w4: comma-separated path "
                        "substrings kept on the full int8 grid (e.g. "
                        "'head/,stem' protects detection heads + stems, "
                        "the classic low-bit-sensitive layers); only "
                        "meaningful with --bits 4")
    p.add_argument("--w4-keep-frac", type=float, default=0.0,
                   help="mixed-precision w4, data-driven: keep this "
                        "fraction of convs with the worst relative int4 "
                        "quantization MSE on the int8 grid (on top of "
                        "--w4-keep patterns)")
    p.add_argument("--clip-search", type=int, choices=[0, 1], default=None,
                   help="per-channel MSE-optimal clip scaling instead of "
                        "absmax (default: ON for --bits 4, OFF for 8 — "
                        "absmax int4 measured AP50 0.61 vs bf16 0.79 on "
                        "the r5 chain; see compress/quantize.py)")
    return p


def calib_batches(args):
    """Yield float32 NHWC [0,255] batches, letterboxed to img_size."""
    import numpy as np

    data_dir = args.data_dir
    if not (data_dir and os.path.isdir(data_dir)):
        # synthetic fallback: render a small deterministic COCO-style set
        import tempfile

        from cocodet_tpu.data.synthetic import make_synthetic_coco

        root = os.path.join(tempfile.gettempdir(), "cocodet_calib_synth")
        img_dir = os.path.join(root, "train2017")
        need = args.batch_size * args.calib_batches
        if not (os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= need):
            make_synthetic_coco(root, n_train=need, n_val=1, seed=7)
        data_dir = img_dir

    from cocodet_tpu.data.folder import FolderLoader, ImageFolderDataset

    ds = ImageFolderDataset(data_dir, args.img_size)
    loader = FolderLoader(ds, args.batch_size, pad_multiple=64)
    for n, (imgs, _infos) in enumerate(loader):
        if n >= args.calib_batches:
            return
        yield np.asarray(imgs, np.float32)


def main():
    args = make_parser().parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from cocodet_tpu.compress import (load_slim_spec, quantization_report,
                                      quantize_model)
    from cocodet_tpu.models import build_model
    from cocodet_tpu.utils.checkpoint import load_checkpoint, load_matched
    from cocodet_tpu.utils.logger import logger

    slim = load_slim_spec(args.slim_spec) if args.slim_spec else None
    kw = dict(num_classes=args.num_classes, depth=args.depth,
              width=args.width, fused=True, slim=slim, dtype=jnp.bfloat16)
    calib_model = build_model(args.name, quant="calib", **kw)

    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(jax.jit(calib_model.init)(jax.random.PRNGKey(0), x0))
    loaded = load_checkpoint(args.ckpt)
    tree = loaded.get("model", loaded)
    variables["params"] = load_matched(variables["params"],
                                       tree.get("params", tree))

    batches = [jnp.asarray(b) for b in calib_batches(args)]
    logger.info("calibrating on %d batches of %s", len(batches),
                tuple(batches[0].shape))
    qvars = quantize_model(calib_model, variables, batches,
                           per_channel_act=args.act_scales == "channel",
                           bits=args.bits,
                           clip_search=(None if args.clip_search is None
                                        else bool(args.clip_search)),
                           w8_keep_patterns=tuple(
                               s for s in (args.w4_keep or "").split(",")
                               if s),
                           w8_keep_frac=args.w4_keep_frac)

    rep = quantization_report(qvars, bits=args.bits)
    logger.info("quantized: %s", json.dumps(rep))

    out_params = qvars["params"]
    if args.bits == 4:
        from flax.traverse_util import flatten_dict
        from cocodet_tpu.compress import pack_int4_tree
        # Declare the packed set explicitly (the kernels quantize_weights
        # put on the nibble grid — per-conv w_bits == 4) so the on-disk
        # format follows --bits/--w4-keep, not the data's value range.
        qf = flatten_dict(qvars["quant"])
        kernel_paths = {p[:-1] + ("kernel",) for p, v in qf.items()
                        if p[-1] == "w_bits" and int(v) == 4}
        out_params = pack_int4_tree(
            jax.tree_util.tree_map(np.asarray, out_params),
            kernel_paths=kernel_paths)
    state = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(
            {"params": out_params, "quant": qvars["quant"]}))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    logger.info("wrote %s (%.1f MB)", args.out,
                os.path.getsize(args.out) / 2**20)


if __name__ == "__main__":
    main()
