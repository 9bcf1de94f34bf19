#!/usr/bin/env python3
"""Standalone submission inference harness.

Parity target: ref choijhanyangackr/main.py:16-286 — the competition
"product": JSON config + CLI overrides, model built by type string, sparse
or dense checkpoint load, optional activation rewrite, warmup forward,
batched folder inference with phase profiling, contrast TTA, COCO-json
output, optional self-evaluation, --dummy smoke mode, challenge-mode
header records.

TPU re-design: the entire per-batch pipeline — forward, grid decode, score
filter, class-aware NMS — is ONE jitted program per shape bucket
(ref main.py:153-203 runs a python loop with per-image torchvision NMS);
aspect bucketing + fixed shape grid bounds compiles to a handful.

Run:  python harness/main.py --config harness/config/yolox_m_p6.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def count_params(tree) -> int:
    import jax

    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(tree))


def build_model_and_vars(cfg, rng_seed: int = 0):
    """Model by type string + checkpoint load (ref main.py:31-59).

    Checkpoint formats:
      - .msgpack: this framework's fused/pruned deployment trees
      - .pth: reference torch checkpoints incl. sparse-COO merged_49.pth
        (ref 03_jh_merge.py:66-87), densified on load (ref main.py:52-55)
    """
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models import build_model

    mcfg = cfg["model"]
    name_map = {
        "yolox": "yolox", "yolox-dw": "yolox-dw",
        "yolox-m-p6": "yolox-p6", "yolox-m-p6-pr": "yolox-p6",
        "yolox-p6": "yolox-p6", "yolox-p6-v2": "yolox-p6v2",
    }
    name = name_map.get(mcfg.get("type", "yolox-p6"), "yolox-p6")
    slim = None
    if cfg.get("slim_spec") and os.path.exists(cfg["slim_spec"]):
        from cocodet_tpu.compress import load_slim_spec

        slim = load_slim_spec(cfg["slim_spec"])
        print(f"channel-slim spec: {len(slim)} csp layers")
    quant = cfg.get("quant")  # "w8a8": int8 PTQ ckpt (compress/quantize.py)
    # stem6: serve the Focus stem as its equivalent 6x6 s2 conv
    # (ops/fuse.py fold_focus_stem rewrites the loaded weights exactly)
    stem6 = bool(cfg.get("stem6", False))
    model = build_model(
        name,
        depth=float(mcfg.get("depth", 0.67)),
        width=float(mcfg.get("width", 0.75)),
        fused=True,
        slim=slim,
        quant=quant,
        stem6=stem6,
        # split-concat FPN deployment graph (models/pafpn.py split_cat):
        # same checkpoint, no concat materializations; exact in int8
        split_cat=bool(cfg.get("split_cat", False)),
        dtype=jnp.bfloat16 if cfg.get("half", True) else jnp.float32,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(rng_seed), x)

    ckpt = cfg.get("ckpt")
    if ckpt and os.path.exists(ckpt):
        if ckpt.endswith(".pth"):
            from cocodet_tpu.utils.torch_import import load_torch_checkpoint
            from cocodet_tpu.utils.checkpoint import load_matched

            imported = load_torch_checkpoint(
                ckpt, variant="p6" if "p6" in name else "standard")
            variables = {"params": load_matched(
                variables["params"], imported["params"])}
        else:
            from cocodet_tpu.utils.checkpoint import load_checkpoint, load_matched

            loaded = load_checkpoint(ckpt)
            tree = loaded.get("model", loaded)
            ckpt_params = tree.get("params", tree)
            if stem6:
                from cocodet_tpu.models.darknet import _FOCUS_ORDER
                from cocodet_tpu.ops.fuse import fold_focus_stem

                variant = "p6" if "p6" in name else "standard"
                ckpt_params = fold_focus_stem(
                    ckpt_params, order=_FOCUS_ORDER[variant])
            variables = {"params": load_matched(
                variables["params"], ckpt_params)}
            if quant == "w8a8":
                # int8 PTQ ckpt (tools/quantize_model.py): per-conv act/
                # weight scales ride in the "quant" collection
                if "quant" not in tree:
                    raise ValueError(
                        f"config asks for quant={quant!r} but {ckpt} has no "
                        "'quant' collection — produce one with "
                        "tools/quantize_model.py")
                quant_tree = tree["quant"]
                if stem6:
                    from cocodet_tpu.ops.fuse import fold_focus_quant

                    quant_tree = fold_focus_quant(quant_tree)
                variables["quant"] = jax.tree_util.tree_map(
                    jnp.asarray, quant_tree)
        print(f"loaded checkpoint {ckpt}")
    else:
        print("WARNING: no checkpoint — random weights (dummy-quality output)")

    print(f"# params: {count_params(variables['params']):,}")
    return model, variables


def run(cfg, out_path: str, profile: bool = False, challenge: bool = False,
        dummy: bool = False):
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.data.coco import COCO_CLASS_ID
    from cocodet_tpu.data.folder import FolderLoader, ImageFolderDataset
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess
    from cocodet_tpu.utils.metric import Timer

    timer = Timer()
    model, variables = build_model_and_vars(cfg)
    strides = (8, 16, 32, 64) if "p6" in cfg["model"].get("type", "p6") else (8, 16, 32)

    pp = cfg.get("postprocess", {})
    ppcfg = PostprocessConfig(
        conf_threshold=float(pp.get("conf_threshold", 0.001)),
        nms_threshold=float(pp.get("nms_threshold", 0.55)),
        multi_class=bool(pp.get("multi_class", False)),
        soft=bool(pp.get("soft", False)),
        rmmop=tuple(pp["rmmop"]) if pp.get("rmmop") else None,
        pre_nms_topk=int(pp.get("max_num_nms", 2048)),
        max_det=int(pp.get("max_num_det", 300)),
        # measured default: the XLA NMS edges the pallas kernel at the
        # production point (2430 vs 2409 img/s @640/b128/K=1024, ROADMAP)
        use_pallas=bool(pp.get("use_pallas", False)),
    )

    aug = cfg.get("input_aug", True)

    # Multi-chip serving, two composable modes (the evaluators' mesh
    # sharding brought to the serving side; params replicated, XLA
    # partitions the one jitted program, detections gather in drain()):
    #   data_parallel:     shard the BATCH dim — throughput scale-out.
    #   spatial_partition: shard the image HEIGHT dim — latency scale-out
    #     for high-res single/small-batch requests; XLA GSPMD inserts the
    #     conv halo exchanges (verified bit-parity on the virtual mesh,
    #     tests/test_harness_dp.py).
    #   both (spatial_partition = int S): 2-D (n/S, S) serving mesh —
    #     batch AND height sharded, for large slices.
    dp = bool(cfg.get("data_parallel", False))
    sp_cfg = cfg.get("spatial_partition", False)
    # spatial_partition accepts true (height over ALL devices) or an
    # integer S (height over S devices — required when combining with
    # data_parallel, where the mesh becomes (n/S data, S space) 2-D).
    sp_n = 0
    if sp_cfg:
        sp_n = -1 if isinstance(sp_cfg, bool) else int(sp_cfg)
    data_sharding = None
    if dp or sp_n:
        from jax.sharding import NamedSharding, PartitionSpec

        from cocodet_tpu.parallel import (DATA_AXIS, SPACE_AXIS,
                                          image_sharding, make_mesh,
                                          make_mesh_2d)

        devices = jax.devices()
        n = len(devices)
        bsz = int(cfg["dataloader"]["batch_size"])
        max_stride = max(strides)
        if sp_n > 0:
            # batch heights from FolderLoader are arbitrary multiples of
            # max_stride (aspect buckets), so S must divide max_stride
            # for every bucket's device_put to stay evenly sharded
            if sp_n <= 1 or sp_n > n or n % sp_n or max_stride % sp_n:
                raise ValueError(
                    f"spatial_partition={sp_n}: need an integer in "
                    f"(1, {n}] dividing both the device count {n} and "
                    f"the max stride {max_stride} (aspect-bucket heights "
                    f"are multiples of {max_stride})")
        if dp and sp_n:
            # 2-D serving mesh: batch over rows, image height over
            # columns — throughput AND per-image latency scale-out on
            # larger slices (forward-only; the training-side grad
            # boundary in Trainer._check_spatial_sizes does not apply)
            if sp_n < 0:
                raise ValueError(
                    "combined data_parallel + spatial_partition needs "
                    "spatial_partition set to an integer >1 (a bare true "
                    "does not define the 2-D split)")
            rows = n // sp_n
            if bsz % rows:
                raise ValueError(
                    f"data_parallel: batch_size {bsz} must be a multiple "
                    f"of the {rows} data rows of the ({rows}, {sp_n}) mesh")
            mesh = make_mesh_2d(sp_n, devices)
            data_sharding = image_sharding(mesh)
        elif dp:
            if bsz % n:
                raise ValueError(
                    f"data_parallel: batch_size {bsz} must be a multiple "
                    f"of the device count {n}")
            mesh = make_mesh(devices)
            data_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        else:
            use = n if sp_n < 0 else sp_n
            mesh = make_mesh(devices[:use], axis_name=SPACE_AXIS)
            data_sharding = NamedSharding(
                mesh, PartitionSpec(None, SPACE_AXIS))
        variables = jax.device_put(
            variables, NamedSharding(mesh, PartitionSpec()))

    def to_device(batch):
        if data_sharding is None:
            return batch
        bsz = int(cfg["dataloader"]["batch_size"])
        if dp and batch.shape[0] < bsz:  # ragged tail -> pad (dets unread)
            pad = jnp.full((bsz - batch.shape[0],) + batch.shape[1:], 114.0,
                           batch.dtype)
            batch = jnp.concatenate([batch, pad], 0)
        return jax.device_put(batch, data_sharding)

    @jax.jit
    def step(images):
        if aug:
            # contrast TTA: x*0.9 + 11.4 (ref main.py:160-164)
            images = images * 0.9 + 11.4
        outputs = model.apply(variables, images)
        return postprocess(outputs, strides, ppcfg)

    timer.toc("setup")

    results = []
    if challenge:
        results.append({"framework": "cocodet_tpu(jax/XLA)",
                        "parameters": count_params(variables["params"])})

    if dummy:
        # --dummy smoke mode (ref main.py:124,185-186): random input, no NMS io
        imgs = np.random.rand(int(cfg["dataloader"]["batch_size"]),
                              cfg["img_size"], cfg["img_size"], 3) * 255
        res = jax.block_until_ready(step(jnp.asarray(imgs, jnp.float32)))
        print("dummy forward ok:", res.boxes.shape)
        return []

    max_stride = max(strides)
    if cfg["img_size"] % max_stride != 0:
        raise ValueError(
            f"img_size {cfg['img_size']} must be a multiple of the model's "
            f"max stride {max_stride} (P6 upsample/concat shapes)")
    dataset = ImageFolderDataset(
        cfg["data_dir"], cfg["img_size"],
        # adaptive lowlight rescue (data/folder.py exposure_normalize);
        # identity on well-exposed images, so safe to leave on.
        exposure_norm=bool(cfg.get("exposure_norm", False)))
    loader = FolderLoader(dataset, int(cfg["dataloader"]["batch_size"]),
                          pad_multiple=max_stride)

    # warmup (ref main.py:137-140)
    warm = np.full((int(cfg["dataloader"]["batch_size"]),
                    cfg["img_size"], cfg["img_size"], 3), 114.0, np.float32)
    jax.block_until_ready(step(to_device(jnp.asarray(warm))))
    timer.toc("warmup")

    n_img = 0

    coco_id = np.asarray(COCO_CLASS_ID, np.int64)

    def drain(res, infos):
        """Host-side conversion of one finished batch.  Vectorized: the
        scale/clip/xywh math runs as whole-batch numpy and the per-det dict
        build iterates python lists (one .tolist() per field), not numpy
        scalars — ~5x less host time per image than the naive per-box loop
        on this 1-core host."""
        nonlocal n_img
        timer.tic()
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        classes = np.asarray(res.classes)
        valid = np.asarray(res.valid)
        timer.toc("forward+nms")  # np.asarray blocks on the device result
        for i, (h, w, name) in enumerate(infos):
            scale = min(cfg["img_size"] / h, cfg["img_size"] / w)
            image_id = int(os.path.splitext(name)[0].lstrip("0") or 0) \
                if name.split(".")[0].isdigit() else name
            nv = int(valid[i].sum())  # valid dets are prefix-packed
            if nv == 0:
                # dummy record for empty images (ref common/utils.py:61-71)
                results.append({"image_id": image_id, "category_id": 1,
                                "bbox": [0.0, 0.0, 0.0, 0.0], "score": 0.0,
                                "segmentation": []})
                n_img += 1
                continue
            b = boxes[i, :nv].astype(np.float64) / scale
            x1 = np.clip(b[:, 0], 0, w)
            y1 = np.clip(b[:, 1], 0, h)
            bw = np.clip(b[:, 2], 0, w) - x1
            bh = np.clip(b[:, 3], 0, h) - y1
            xywh = np.round(np.stack([x1, y1, bw, bh], 1), 2).tolist()
            sc = np.round(scores[i, :nv].astype(np.float64), 5).tolist()
            cat = coco_id[classes[i, :nv].astype(np.int64)].tolist()
            for bb, s, c in zip(xywh, sc, cat):
                results.append({"image_id": image_id, "category_id": c,
                                "bbox": bb, "score": s,
                                "segmentation": []})
            n_img += 1
        timer.toc("convert")

    # software-pipelined loop: while batch k computes on device (async jax
    # dispatch), batch k-1's results convert on host
    pending = None
    for imgs, infos in loader:
        timer.tic()
        batch = to_device(jnp.asarray(imgs))
        timer.toc("h2d")
        res = step(batch)  # async dispatch — do not block here
        if pending is not None:
            drain(*pending)
        pending = (res, infos)
    if pending is not None:
        drain(*pending)

    with open(out_path, "w") as f:
        json.dump(results, f)
    timer.toc("json")
    print(f"wrote {len(results)} records for {n_img} images -> {out_path}")

    if profile:
        for name, meter in timer.meters.items():
            print(f"  {name:12s}: total {meter.global_avg * meter._count:.3f}s")

    ann = cfg.get("annotation")
    if ann and os.path.exists(ann):
        # self-evaluation (ref main.py:230-235)
        from cocodet_tpu.evaluators.coco_metric import COCOMeanAP

        with open(ann) as f:
            gt = json.load(f)
        metric = COCOMeanAP()
        metric.add_gt_annotations(gt["annotations"])
        metric.add_detections([r for r in results if "bbox" in r
                               and r["score"] > 0])
        stats = metric.summarize(verbose=True)
        print(f"mAP@0.5 = {stats['AP50']:.4f}")
    return results


def main():
    ap = argparse.ArgumentParser("cocodet_tpu submission harness")
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "config", "yolox_m_p6.json"))
    ap.add_argument("--out", default="answersheet_4_04_cocodet.json")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--challenge", action="store_true")
    ap.add_argument("--dummy", action="store_true")
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    args = ap.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)
    # CLI overrides (ref main.py:259-284 precedence)
    if args.img_size:
        cfg["img_size"] = args.img_size
    if args.ckpt:
        cfg["ckpt"] = args.ckpt
    if args.data_dir:
        cfg["data_dir"] = args.data_dir
    if args.batch_size:
        cfg["dataloader"]["batch_size"] = args.batch_size

    t0 = time.time()
    run(cfg, args.out, profile=args.profile, challenge=args.challenge,
        dummy=args.dummy)
    print(f"total time: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
