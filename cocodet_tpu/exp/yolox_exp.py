"""Default experiment classes — full hyperparameter surface of the reference.

Parity targets:
  - Exp (standard YOLOX defaults)  ref yolox/exp/yolox_base.py:19-352
  - CustomExp                      ref yolox/exp/yolox_custom.py:19-355
  - CustomP6Exp                    ref yolox/exp/yolox_p6.py:19-355
  - CustomP6v2Exp                  ref yolox/exp/yolox_p6_v2.py
  - SynFlowExp                     ref yolox/exp/yolox_synflow.py:95-116

TPU re-designs baked into the factories:
  * optimizer: optax sgd+momentum chain with weight decay masked to conv
    kernels only (BN and biases excluded — the reference builds 3 param
    groups for the same effect, ref yolox_base.py:231-248);
  * multiscale: a finite bucket set of input sizes (ref random_resize
    broadcasts a random size from rank 0 every 10 iters,
    yolox_base.py:185-213); here the size index comes from a seeded host RNG
    shared by all processes — no collective needed — and each bucket is a
    distinct static shape so XLA compiles each size exactly once;
  * preprocess (resize to the current multiscale size) runs on device as a
    jitted bilinear resize (ref yolox_base.py:215-222 does interpolate on
    GPU).
"""

from __future__ import annotations

import math
import os
import random
from typing import Optional, Sequence, Tuple

from .base_exp import BaseExp


class Exp(BaseExp):
    """Standard YOLOX experiment defaults (ref yolox_base.py:19-111)."""

    def __init__(self):
        super().__init__()
        # ---------------- model config ----------------
        self.num_classes = 80
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"
        self.model_name = "yolox"        # registry key (models.build_model)
        self.strides = (8, 16, 32)
        self.bn_momentum = 0.03          # ref yolox_base.py:96-100
        self.bn_eps = 1e-3

        # ---------------- dataloader config ----------------
        self.data_num_workers = 4
        self.input_size = (640, 640)
        self.multiscale_range = 5        # ±5 steps of the stride granularity
        self.multiscale_step = 32        # P6 exps use 64 (ref yolox_p6.py:203-207)
        self.data_dir = None
        self.train_ann = "instances_train2017.json"
        self.val_ann = "instances_val2017.json"
        self.max_labels_mosaic = 120
        self.max_labels = 50

        # ---------------- transform config ----------------
        self.mosaic_prob = 1.0
        self.mixup_prob = 1.0
        self.hsv_prob = 1.0
        self.flip_prob = 0.5
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2.0)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.enable_mixup = True
        # move HSV + flip + letterbox + label padding onto the TPU as one
        # jitted batched program (data/device_aug.py); the host keeps only
        # decode + mosaic/affine composition.  Raw frames ship as uint8
        # static buffers of src_scale * input_size.  Every image entering
        # the collate is already <= input_size (datasets pre-resize at
        # pull_item; mosaic/mixup outputs are exactly input_size), so 1.0
        # is the tight default — larger values only pad the H2D transfer
        # (the collate warns loudly if an oversize frame ever appears).
        self.device_aug = False
        self.device_aug_src_scale = 1.0
        self.device_aug_max_boxes = 120
        # device_mosaic: ALSO move mosaic compose + random affine + mixup
        # onto the accelerator (data/device_mosaic.py) — the host keeps
        # only decode + RNG.  Implies the device TrainTransform stage.
        self.device_mosaic = False
        # per-tile box buffer — matches max_labels_mosaic so no
        # tile ever silently drops ground truth vs the host path
        self.device_mosaic_max_boxes = 120

        # ---------------- training config ----------------
        self.num_accumulate = 1
        # remat: jax.checkpoint the model forward in the train step —
        # trades ~1 extra forward of FLOPs for the activation memory
        # (enables e.g. b128@640 with mosaic-density labels on a 16G v5e,
        # see ROADMAP.md "device-mosaic memory envelope")
        self.remat = False
        # simota_bf16: bf16 SimOTA cost/IoU matrices (assignment-only
        # approximation, targets stay f32 — ops/simota.py).  Halves the
        # (B, G, A) HBM traffic of the loss stage; off by default until
        # the TPU A/B shows it pays (tools/bench_train.py --simota-bf16)
        self.simota_bf16 = False
        # spatial_devices: columns of a 2-D (data, space) training mesh —
        # shards image HEIGHT over the second axis (GSPMD conv halos) so
        # activation memory scales out across chips; 1 = plain DP
        # (parallel.make_mesh_2d; numerics identical, tests/test_training.py)
        self.spatial_devices = 1
        self.warmup_epochs = 5
        self.max_epoch = 300
        self.warmup_lr = 0.0
        self.basic_lr_per_img = 0.01 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 15
        self.min_lr_ratio = 0.05
        self.ema = True
        self.ema_momentum = 0.9998
        self.iou_type = "iou"
        self.weight_decay = 5e-4
        self.momentum = 0.9
        self.print_interval = 10
        self.eval_interval = 10
        # epochs between "latest" checkpoint writes (the final epoch always
        # saves).  The full train state is ~0.5 GB on M-P6 — a per-epoch
        # host readback + msgpack write costs ~30 s on a 1-core host, which
        # dominates short-epoch synthetic chains.
        self.ckpt_interval = 1
        self.compute_dtype = "bfloat16"  # TPU analogue of --fp16 AMP

        # ---------------- testing config ----------------
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nms_threshold = 0.65
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

    # ---------------- factories ----------------
    def get_model(self, fused: bool = False, use_mask: bool = False,
                  weight_mask: bool = False, axis_name: Optional[str] = None):
        import jax.numpy as jnp
        from ..models import build_model

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self.compute_dtype]
        return build_model(
            self.model_name, num_classes=self.num_classes, depth=self.depth,
            width=self.width, fused=fused, use_mask=use_mask,
            weight_mask=weight_mask, dtype=dtype, axis_name=axis_name)

    def get_dataset(self, cache: bool = False):
        from ..data import COCODataset, TrainTransform

        return COCODataset(
            data_dir=self.data_dir,
            json_file=self.train_ann,
            name="train2017",
            img_size=self.input_size,
            preproc=TrainTransform(max_labels=self.max_labels,
                                   flip_prob=self.flip_prob,
                                   hsv_prob=self.hsv_prob),
            cache=cache,
        )

    def get_data_loader(self, batch_size: int, is_distributed: bool = False,
                        no_aug: bool = False, cache_img: bool = False,
                        rank: int = 0, world_size: int = 1, seed: int = 0):
        from ..data import (DetectionLoader, InfiniteSampler, MosaicDetection,
                            TrainTransform, YoloBatchSampler)

        dataset = self.get_dataset(cache=cache_img)
        dataset.preproc = None  # mosaic wrapper applies the transform
        device_aug = getattr(self, "device_aug", False)
        device_mosaic = getattr(self, "device_mosaic", False)
        item_rng = random.Random(1_000_003 * (seed + 1) + rank)
        sampler = InfiniteSampler(len(dataset), seed=seed, rank=rank,
                                  world_size=world_size)
        batch_sampler = YoloBatchSampler(sampler, batch_size,
                                         mosaic=not no_aug)
        collate_fn = None
        if device_mosaic:
            # full device pipeline: host keeps decode + RNG only
            # (data/device_mosaic.py) — no MosaicDetection involved
            from ..data.device_mosaic import (DeviceMosaicDataset,
                                              make_mosaic_collate)

            wrapped = DeviceMosaicDataset(
                dataset, img_size=self.input_size, degrees=self.degrees,
                translate=self.translate, mosaic_scale=self.mosaic_scale,
                mixup_scale=self.mixup_scale, shear=self.shear,
                enable_mixup=self.enable_mixup,
                mosaic_prob=self.mosaic_prob, mixup_prob=self.mixup_prob,
                mosaic=not no_aug, hsv_prob=self.hsv_prob, rng=item_rng)
            collate_fn = make_mosaic_collate(
                self.input_size,
                max_boxes=getattr(self, "device_mosaic_max_boxes", 120))
        else:
            mosaic = MosaicDetection(
                dataset,
                mosaic=not no_aug,
                img_size=self.input_size,
                # device_aug: per-pixel train transform runs on the TPU
                # instead (data/device_aug.py); fetch then returns the raw
                # composed image
                preproc=None if device_aug else TrainTransform(
                    max_labels=self.max_labels_mosaic,
                    flip_prob=self.flip_prob,
                    hsv_prob=self.hsv_prob),
                degrees=self.degrees,
                translate=self.translate,
                mosaic_scale=self.mosaic_scale,
                mixup_scale=self.mixup_scale,
                shear=self.shear,
                enable_mixup=self.enable_mixup,
                mosaic_prob=self.mosaic_prob,
                mixup_prob=self.mixup_prob,
                rng=item_rng,
            )
            wrapped = mosaic
            if device_aug:
                from ..data.device_aug import (DeviceAugDataset,
                                               make_device_collate)

                scale = getattr(self, "device_aug_src_scale", 1.0)
                src_size = (int(self.input_size[0] * scale),
                            int(self.input_size[1] * scale))
                wrapped = DeviceAugDataset(mosaic, hsv_prob=self.hsv_prob)
                collate_fn = make_device_collate(
                    src_size,
                    max_boxes=getattr(self, "device_aug_max_boxes", 120),
                    out_size=self.input_size)
        return DetectionLoader(wrapped, batch_sampler,
                               num_workers=self.data_num_workers, seed=seed,
                               collate_fn=collate_fn)

    def get_optimizer(self, batch_size: int):
        """SGD + nesterov momentum; weight decay only on conv kernels
        (ref yolox_base.py:224-251 3-group construction)."""
        import optax
        from flax import traverse_util

        lr = self.basic_lr_per_img * batch_size

        def decay_mask(params):
            flat = traverse_util.flatten_dict(params)
            return traverse_util.unflatten_dict({
                k: (k[-1] == "kernel") for k in flat
            })

        return optax.chain(
            optax.add_decayed_weights(self.weight_decay, mask=decay_mask),
            optax.sgd(learning_rate=self.get_lr_schedule_placeholder(lr),
                      momentum=self.momentum, nesterov=True),
        )

    def get_lr_schedule_placeholder(self, lr: float):
        """Returns an optax schedule closure; finalized by get_lr_scheduler
        once iters_per_epoch is known. Default: constant (the Trainer always
        installs the real schedule)."""
        self._base_lr = lr
        if getattr(self, "_lr_schedule", None) is not None:
            return self._lr_schedule
        return lr

    def get_lr_scheduler(self, lr: float, iters_per_epoch: int):
        from ..utils.lr_scheduler import build_lr_schedule

        sched = build_lr_schedule(
            self.scheduler, lr, iters_per_epoch, self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio)
        self._lr_schedule = sched
        return sched

    def multiscale_sizes(self) -> Sequence[Tuple[int, int]]:
        """The finite static-shape bucket set replacing random_resize
        (ref yolox_base.py:185-213)."""
        if isinstance(self.multiscale_range, tuple):
            lo, hi = self.multiscale_range
        else:
            lo, hi = -self.multiscale_range, self.multiscale_range
        step = self.multiscale_step
        base = self.input_size[0] // step
        return [(step * (base + k), step * (base + k))
                for k in range(lo, hi + 1)]

    def random_input_size(self, step_rng: random.Random) -> Tuple[int, int]:
        sizes = self.multiscale_sizes()
        return sizes[step_rng.randrange(len(sizes))]

    def get_eval_dataset(self, testdev: bool = False, legacy: bool = False):
        from ..data import COCODataset, ValTransform

        return COCODataset(
            data_dir=self.data_dir,
            json_file=self.val_ann if not testdev else "instances_test2017.json",
            name="val2017" if not testdev else "test2017",
            img_size=self.test_size,
            preproc=ValTransform(legacy=legacy),
        )

    def get_evaluator(self, batch_size: int, is_distributed: bool = False,
                      testdev: bool = False, legacy: bool = False):
        from ..evaluators import COCOEvaluator

        return COCOEvaluator(
            dataset=self.get_eval_dataset(testdev=testdev, legacy=legacy),
            img_size=self.test_size,
            conf_threshold=self.test_conf,
            nms_threshold=self.nms_threshold,
            num_classes=self.num_classes,
            batch_size=batch_size,
            testdev=testdev,
        )

    def eval(self, model_vars, evaluator, is_distributed: bool = False):
        return evaluator.evaluate(self, model_vars)


class CustomExp(Exp):
    """3-scale custom model, hard_swish (ref yolox_custom.py:19-120)."""

    def __init__(self):
        super().__init__()
        self.act = "hard_swish"
        self.model_name = "yolox-custom"
        self.data_num_workers = 2
        self.ema_momentum = 0.9998


class CustomP6Exp(Exp):
    """P6 4-scale competition lineage (ref yolox_p6.py:19-120)."""

    def __init__(self):
        super().__init__()
        self.act = "hard_swish"
        self.model_name = "yolox-p6"
        self.strides = (8, 16, 32, 64)
        self.input_size = (768, 768)
        self.test_size = (768, 768)
        self.multiscale_range = (-3, 1)
        self.multiscale_step = 64        # stride-64 granularity (ref yolox_p6.py:203-207)
        self.data_num_workers = 2
        self.test_conf = 0.001
        self.ema_momentum = 0.9998


class CustomP6v2Exp(CustomP6Exp):
    def __init__(self):
        super().__init__()
        self.model_name = "yolox-p6v2"


class SynFlowExp(Exp):
    """SynFlow pruning config (ref yolox_synflow.py:95-116)."""

    def __init__(self):
        super().__init__()
        self.prune_iters = 100
        self.prune_ratio = 0.5
        self.prune_epoch = 10

    def get_model(self, **kwargs):
        kwargs.setdefault("weight_mask", True)
        return super().get_model(**kwargs)
