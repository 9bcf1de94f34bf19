#!/usr/bin/env python3
"""Score one deployment checkpoint across the synthetic robustness family
(default / occlusion / crowding / texture) in a single command.

The per-variant val sets are generated deterministically (val generation
seeds from ``seed + 77777`` only, so the val split is identical for any
n_train — see data/synthetic.py make_synthetic_coco) and each variant is
scored through the submission harness, the same stage-6 self-eval
run_pipeline uses.  Prints the table ROADMAP.md tracks across rounds and
writes a JSON next to the checkpoint.

Usage:
  python tools/eval_robustness.py -c outputs/r3_chain_fix/pipe_slim_ckpt.msgpack \
      --slim-spec outputs/r3_chain_fix/pipe_slim_spec.json --img-size 320
"""

import argparse
import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "harness"))

VARIANTS = ("default", "occlusion", "crowding", "texture",
            "smallobj", "lowlight")


def variant_root(variant: str, n_val: int, size: int, seed: int) -> str:
    """Generate (or reuse) the variant's COCO-layout dataset; train split is
    kept minimal — only val2017 is scored."""
    from cocodet_tpu.data.synthetic import make_synthetic_coco

    root = f"/tmp/cocodet_robust_s{seed}_v{n_val}_{size}/{variant}"
    marker = os.path.join(root, "annotations", "instances_val2017.json")
    if not os.path.exists(marker):
        make_synthetic_coco(root, n_train=4, n_val=n_val,
                            size_range=(size, size * 2), seed=seed,
                            variant=variant)
    return root


def score(data_dir: str, out_json: str) -> dict:
    from cocodet_tpu.evaluators.coco_metric import score_detections_json

    return score_detections_json(
        os.path.join(data_dir, "annotations", "instances_val2017.json"),
        out_json)


def main():
    ap = argparse.ArgumentParser("eval_robustness")
    ap.add_argument("-c", "--ckpt", required=True)
    ap.add_argument("--slim-spec", default=None)
    ap.add_argument("--quant", default=None, choices=[None, "w8a8"])
    ap.add_argument("--depth", type=float, default=0.33)
    ap.add_argument("--width", type=float, default=0.25)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("-b", "--batch-size", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--nms", type=float, default=0.65)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--exposure-norm", action="store_true",
                    help="adaptive per-image exposure normalization in the "
                         "harness preproc (data/folder.py)")
    ap.add_argument("-o", "--out", default=None,
                    help="results json (default: <ckpt>_robustness.json)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import importlib

    hmain = importlib.import_module("main")

    table = {}
    for variant in VARIANTS:
        root = variant_root(variant, args.n_val, args.img_size, args.seed)
        cfg = {
            "model": {"type": "yolox-p6", "depth": args.depth,
                      "width": args.width},
            "ckpt": args.ckpt,
            "slim_spec": args.slim_spec,
            "quant": args.quant,
            "img_size": args.img_size,
            "half": True,
            "data_dir": os.path.join(root, "val2017"),
            "dataloader": {"batch_size": args.batch_size},
            "postprocess": {"conf_threshold": args.conf,
                            "nms_threshold": args.nms,
                            "use_pallas": False},
            "input_aug": False,
            "exposure_norm": args.exposure_norm,
        }
        det_json = os.path.join(root, "detections.json")
        hmain.run(cfg, det_json)
        stats = score(root, det_json)
        table[variant] = {"AP50": stats["AP50"], "AP": stats["AP"]}
        print(f"{variant:>10}: AP50={stats['AP50']:.4f} "
              f"AP={stats['AP']:.4f}", flush=True)

    out = args.out or os.path.splitext(args.ckpt)[0] + "_robustness.json"
    with open(out, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
