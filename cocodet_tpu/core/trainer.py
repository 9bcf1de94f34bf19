"""Trainer — the epoch/iteration runtime.

Parity target: ref yolox/core/trainer.py:34-359:
  before_train (model/optimizer/loader build, resume), train_in_epoch /
  train_in_iter / train_one_iter, multiscale resize every 10 iters, no-aug
  switch + L1 at max_epoch - no_aug_epochs, periodic eval with best-AP50
  checkpointing, meters + ETA logging, EMA, occupy/TF-board hooks.
  (The reference's save_ckpt has a `self.fine_name` typo crash at
  trainer.py:357 — intentionally not reproduced.)

TPU re-design highlights:
  * one jitted train step (see train_state.py); python only moves host
    batches and bookkeeping;
  * multiscale via static bucket sizes chosen by a seeded RNG shared across
    hosts (replaces the rank-0 dist.broadcast, ref yolox_base.py:208-210);
  * eval uses the EMA shadow variables directly (no module deepcopy);
  * checkpoints are msgpack pytrees (ref .pth zoo).
"""

from __future__ import annotations

import os
import random
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.samplers import DevicePrefetcher
from ..parallel import make_mesh, replicate
from ..utils.checkpoint import load_checkpoint, load_matched, save_checkpoint
from ..utils.logger import logger, setup_logger
from ..utils.metric import MeterBuffer, device_mem_usage_mb
from .train_state import TrainState, create_train_state, make_train_step, resize_batch


class Trainer:
    def __init__(self, exp, args):
        self.exp = exp
        self.args = args
        self.max_epoch = exp.max_epoch
        self.input_size = exp.input_size
        self.best_ap = 0.0
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.file_name = os.path.join(exp.output_dir, exp.exp_name)
        self.rank = jax.process_index()
        if self.rank == 0:
            os.makedirs(self.file_name, exist_ok=True)
        setup_logger(self.file_name, rank=self.rank, filename="train_log.txt")
        # iteration bookkeeping
        self.epoch = 0
        self.start_epoch = 0
        self.use_l1 = False
        self.tblogger = None  # set in before_train (Trainer only)

    # ------------------------------------------------------------------
    def train(self):
        self.before_train()
        try:
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.train_in_iter()
                self.after_epoch()
        finally:
            logger.info("training done, best AP50 = %.4f", self.best_ap)

    # ------------------------------------------------------------------
    def before_train(self):
        exp = self.exp
        batch_size = self.args.batch_size
        logger.info("exp value:\n%s", exp)

        # Mask-aware model build: if the init checkpoint carries a pruned
        # ``masks`` collection (Pruner output), the fine-tune model must be
        # built with ChannelMask layers and the masks held fixed — the
        # reference's tune.py resumes the masked model from the prune ckpt
        # (ref yolox/core/tuner.py:197-210 + network_blocks.py:27-41).
        init_ckpt = getattr(exp, "init_ckpt", None)
        self._init_tree = load_checkpoint(init_ckpt) if init_ckpt else None
        ckpt_model = (self._init_tree or {}).get("model", self._init_tree)
        ckpt_masks = (ckpt_model or {}).get("masks") or None
        use_mask = bool(getattr(exp, "use_mask", False) or ckpt_masks)
        # Only pass use_mask when it's actually needed: out-of-tree Exp
        # subclasses may override get_model() with the base class's zero-arg
        # signature (base_exp.py:33) and would TypeError otherwise.
        self.model = (exp.get_model(use_mask=True) if use_mask
                      else exp.get_model())
        self.optimizer_tx = None  # built after iters_per_epoch known

        self.train_loader = exp.get_data_loader(
            batch_size=batch_size,
            is_distributed=jax.process_count() > 1,
            no_aug=self.start_epoch >= self.max_epoch - exp.no_aug_epochs,
            cache_img=getattr(self.args, "cache", False),
            rank=self.rank,
            world_size=jax.process_count(),
            seed=exp.seed or 0,
        )
        self.iters_per_epoch = max(
            len(self.train_loader.dataset) // batch_size, 1)

        lr = exp.basic_lr_per_img * batch_size
        self.lr_schedule = exp.get_lr_scheduler(lr, self.iters_per_epoch)
        self.optimizer_tx = exp.get_optimizer(batch_size)
        import optax
        if exp.num_accumulate > 1:
            self.optimizer_tx = optax.MultiSteps(
                self.optimizer_tx, every_k_schedule=exp.num_accumulate)

        rng = jax.random.PRNGKey(exp.seed or 0)
        sample = jnp.zeros((1, *exp.input_size, 3), jnp.float32)
        init_vars = None
        if use_mask:
            init_vars = self.model.init(rng, sample, train=False)
            self.masks = init_vars.get("masks", {})
        self.state = create_train_state(
            self.model, self.optimizer_tx, rng, sample,
            use_ema=exp.ema, init_vars=init_vars)
        if init_ckpt:
            self._load_init_ckpt(init_ckpt)
        self.resume_train()

        self._setup_mesh(batch_size)

        self.train_step = make_train_step(
            self.model, self.optimizer_tx, strides=exp.strides,
            num_classes=exp.num_classes, iou_type=exp.iou_type,
            ema_decay=exp.ema_momentum, use_ema=exp.ema,
            remat=getattr(exp, "remat", False),
            simota_bf16=getattr(exp, "simota_bf16", False))

        self.evaluator = exp.get_evaluator(
            batch_size=batch_size, is_distributed=jax.process_count() > 1)
        if self.eval_sharding is not None and hasattr(self.evaluator,
                                                      "sharding"):
            self.evaluator.sharding = self.eval_sharding
        self.size_rng = random.Random((exp.seed or 0) + 1234)
        self.prefetcher = DevicePrefetcher(self.train_loader,
                                           sharding=self.data_sharding)
        self.data_iter = self.prefetcher  # has .next()
        self.tblogger = None
        if self.rank == 0:
            try:  # TensorBoard scalars (ref trainer.py:207-209,335-337)
                from torch.utils.tensorboard import SummaryWriter

                self.tblogger = SummaryWriter(self.file_name)
            except Exception:
                logger.info("tensorboard unavailable; skipping TB logs")
        logger.info("init done; %d iters/epoch, device mem %.0f MB",
                    self.iters_per_epoch, device_mem_usage_mb())

    def _setup_mesh(self, batch_size: int):
        """Device mesh (replaces ref DDP wrap, trainer.py:194-195): params
        are replicated, batches batch-sharded over the "data" axis; jit/GSPMD
        inserts the gradient psums AND computes BN stats over the GLOBAL
        batch (true SyncBN) over ICI. If the batch doesn't divide over all
        devices, the largest device count that divides it is used.

        exp.spatial_devices > 1 adds a second "space" mesh axis that shards
        image HEIGHT (GSPMD conv halos) — activation-memory scale-out for
        operating points that OOM one chip (device-mosaic b128@640/G=120
        needs 14.7 GB vs the 16 GB v5e, ROADMAP.md).  Numerically identical
        to the 1-D mesh (tests/test_training.py 2-D parity test); the
        serving-side counterpart is harness spatial_partition mode."""
        self.mesh = None
        self.data_sharding = None
        self.eval_sharding = None
        n_dev = jax.device_count()
        spatial = int(getattr(self.exp, "spatial_devices", 1) or 1)
        if spatial > 1 and n_dev == 1:
            # don't die (CPU smoke runs), but never silently drop the
            # setting — the spatial exp exists to avoid a single-chip OOM
            logger.warning(
                "exp.spatial_devices=%d requested but only 1 device is "
                "visible — training UNSHARDED (the operating point this "
                "exp targets may OOM a single chip)", spatial)
        if n_dev > 1:
            import math as _math

            if spatial > 1:
                if n_dev % spatial:
                    raise ValueError(
                        f"spatial_devices={spatial} must divide the device "
                        f"count {n_dev}")
                self._check_spatial_sizes(spatial)
                from ..parallel import batch_sharding_fn, image_sharding, \
                    make_mesh_2d

                rows = n_dev // spatial
                use = _math.gcd(batch_size, rows)
                if use < rows:
                    logger.warning(
                        "batch_size %d not divisible by %d data rows; "
                        "using a (%d, %d) mesh", batch_size, rows, use,
                        spatial)
                self.mesh = make_mesh_2d(
                    spatial, jax.devices()[:use * spatial])
                self.data_sharding = batch_sharding_fn(self.mesh)
                self.eval_sharding = image_sharding(self.mesh)
                self.state = replicate(self.mesh, self.state)
                logger.info("training over a (%d data x %d space) mesh",
                            use, spatial)
                return
            use = _math.gcd(batch_size, n_dev)
            if use < n_dev:
                logger.warning(
                    "batch_size %d not divisible by %d devices; "
                    "using a %d-device mesh", batch_size, n_dev, use)
            if use > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                self.mesh = make_mesh(jax.devices()[:use])
                self.data_sharding = NamedSharding(
                    self.mesh, PartitionSpec("data"))
                self.eval_sharding = self.data_sharding
                self.state = replicate(self.mesh, self.state)
                logger.info("training over a %d-device data mesh", use)

    def _check_spatial_sizes(self, spatial: int):
        """Spatial-sharding validity guard, MEASURED boundary (f64
        differential study, ROADMAP.md round-3 session 3): XLA SPMD
        produces exactly-integer-factor WRONG conv gradients once a
        sharded feature map degenerates to <2 rows per device (H=128
        input -> 237 bad leaves, worst 16x; H=256 -> all grads exact to
        1e-12).  Every training size (input_size + all multiscale
        buckets) must therefore keep the deepest map evenly divided with
        >=2 rows per space device: H % (max_stride*spatial) == 0 and
        H >= 2*spatial*max_stride."""
        exp = self.exp
        max_stride = max(exp.strides)
        sizes = list(exp.multiscale_sizes())
        if tuple(exp.input_size) not in sizes:
            sizes.append(tuple(exp.input_size))
        for h, w in sizes:
            if h % (max_stride * spatial) or h < 2 * spatial * max_stride:
                raise ValueError(
                    f"spatial_devices={spatial}: training size {h} is in "
                    f"the measured-unsafe sharding regime (need H % "
                    f"{max_stride * spatial} == 0 and H >= "
                    f"{2 * spatial * max_stride} so every feature map "
                    f"keeps >=2 evenly-divided rows per space device; "
                    f"see Trainer._check_spatial_sizes)")
        # eval batches are space-sharded too (eval_sharding), but eval is
        # forward-only — it needs only device_put divisibility, not the
        # gradient boundary above
        th = exp.test_size[0]
        if th % spatial:
            raise ValueError(
                f"spatial_devices={spatial}: test_size height {th} must "
                f"be divisible by the space axis for sharded eval")

    def _load_init_ckpt(self, path: str):
        ckpt = (self._init_tree if getattr(self, "_init_tree", None)
                is not None else load_checkpoint(path))
        model_vars = ckpt.get("model", ckpt)
        self.state = self.state._replace(
            params=load_matched(self.state.params, model_vars.get(
                "params", model_vars)),
            batch_stats=load_matched(
                self.state.batch_stats, model_vars.get("batch_stats", {})),
        )
        if getattr(self, "masks", None) and model_vars.get("masks"):
            self.masks = load_matched(self.masks, model_vars["masks"])
        # re-seed the EMA shadow from the init weights: eval_variables and
        # save_ckpt read the shadow, which otherwise reflects the random
        # init until the decay ramp catches up (same rationale as the
        # resume path below; ref ema.py seeds ModelEMA from the live model)
        if self.state.ema is not None:
            from ..utils.ema import ema_init

            self.state = self.state._replace(ema=ema_init(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats}))
        logger.info("loaded init checkpoint %s", path)

    # ------------------------------------------------------------------
    def before_epoch(self):
        exp = self.exp
        logger.info("---> start train epoch %d", self.epoch + 1)
        # resume inside the tail also triggers the switch
        # (ref trainer.py:219-228 `or self.no_aug` with no_aug computed from
        # start_epoch)
        if (self.epoch + 1 >= self.max_epoch - exp.no_aug_epochs
                or getattr(self.args, "no_aug", False)):
            logger.info("--->No mosaic aug now! Add additional L1 loss now!")
            self.train_loader.close_mosaic()
            self.use_l1 = True
            exp.eval_interval = 1

    def train_in_iter(self):
        exp = self.exp
        cur_size = self.input_size
        for it in range(self.iters_per_epoch):
            iter_start = time.perf_counter()
            imgs, labels, _, _ = self._next_batch()
            data_end = time.perf_counter()

            # multiscale bucket switch every 10 global iters
            # (ref trainer.py:147 + yolox_base.py:185-213)
            global_iter = self.epoch * self.iters_per_epoch + it
            if global_iter % 10 == 0:
                cur_size = exp.random_input_size(self.size_rng)
            if tuple(cur_size) != tuple(imgs.shape[1:3]):
                scale_y = cur_size[0] / imgs.shape[1]
                scale_x = cur_size[1] / imgs.shape[2]
                imgs = resize_batch(imgs, tuple(cur_size))
                # labels layout: [cls, cx, cy, w, h] -> x at 1,3 ; y at 2,4
                # (ref exp.preprocess scales targets, yolox_base.py:215-222)
                scale = jnp.asarray([1.0, scale_x, scale_y, scale_x, scale_y])
                labels = jnp.asarray(labels) * scale

            self.state, metrics = self.train_step(
                self.state, imgs, labels, use_l1=self.use_l1,
                masks=getattr(self, "masks", None))
            if (it + 1) % exp.print_interval == 0:
                metrics = jax.device_get(metrics)  # sync point
                iter_end = time.perf_counter()
                self.meter.update(
                    data_time=data_end - iter_start,
                    iter_time=iter_end - iter_start,
                    lr=float(np.asarray(self.lr_schedule(
                        jnp.asarray(global_iter, jnp.float32)))),
                    **{k: float(v) for k, v in metrics.items()})
                self._log_progress(it, cur_size)

    def _next_batch(self):
        """Pull a batch; on the device_aug path the loader delivers raw
        uint8 static buffers and the jitted batched TrainTransform runs
        on-device here (data/device_aug.py) — async dispatch overlaps it
        with the previous train step."""
        imgs, labels, infos, ids = self.data_iter.next()
        if isinstance(imgs, dict):
            from ..data.device_aug import apply_device_preproc

            imgs, labels = apply_device_preproc(
                self.exp, tuple(self.input_size), imgs)
            # On a 2-D (data, space) mesh, the raw mosaic/aug dict leaves
            # are batch-sharded only (rank-5 tiles etc.), so the jitted
            # preproc programs emit batch-sharded images — reshard here or
            # the train step replicates activations over the space axis
            # and the mesh's memory scale-out silently never happens.
            mesh = getattr(self, "mesh", None)
            if mesh is not None and "space" in mesh.axis_names:
                from ..parallel import data_sharding, image_sharding

                imgs = jax.device_put(imgs, image_sharding(mesh))
                labels = jax.device_put(
                    labels, data_sharding(mesh, np.ndim(labels)))
        return imgs, labels, infos, ids

    def _log_progress(self, it: int, cur_size):
        left_iters = (self.iters_per_epoch * (self.max_epoch - self.epoch)
                      - (it + 1))
        eta = left_iters * self.meter["iter_time"].avg / max(
            self.exp.print_interval, 1)
        loss_str = ", ".join(
            f"{k}: {self.meter[k].latest:.3f}"
            for k in ("loss", "iou_loss", "obj_loss", "cls_loss", "l1_loss"))
        logger.info(
            "epoch: %d/%d, iter: %d/%d, %s, lr: %.3e, size: %s, ETA: %.0fs",
            self.epoch + 1, self.max_epoch, it + 1, self.iters_per_epoch,
            loss_str, self.meter["lr"].latest, cur_size, eta)

    # ------------------------------------------------------------------
    def after_epoch(self):
        interval = max(int(getattr(self.exp, "ckpt_interval", 1)), 1)
        if ((self.epoch + 1) % interval == 0
                or self.epoch + 1 == self.max_epoch):
            self.save_ckpt("latest")
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            self.evaluate_and_save_model()

    def eval_variables(self) -> Dict[str, Any]:
        if self.state.ema is not None:
            out = dict(self.state.ema.shadow)
        else:
            out = {"params": self.state.params,
                   "batch_stats": self.state.batch_stats}
        if getattr(self, "masks", None):
            out["masks"] = self.masks
        return out

    def evaluate_and_save_model(self):
        ap, ap50, summary = self.evaluator.evaluate(
            self.exp, self.eval_variables(), model=self.model)
        logger.info("epoch %d eval: %s", self.epoch + 1, summary)
        if self.tblogger is not None:
            self.tblogger.add_scalar("val/COCOAP50", ap50, self.epoch + 1)
            self.tblogger.add_scalar("val/COCOAP50_95", ap, self.epoch + 1)
        self.save_ckpt(f"epoch_{self.epoch + 1}", ap50 > self.best_ap)
        self.best_ap = max(self.best_ap, ap50)

    def save_ckpt(self, name: str, is_best: bool = False):
        if self.rank != 0:
            return
        state = {
            "start_epoch": self.epoch + 1,
            "model": jax.device_get(self.eval_variables()),
            "raw_model": jax.device_get({
                "params": self.state.params,
                "batch_stats": self.state.batch_stats}),
            "opt_state": jax.device_get(self.state.opt_state),
            "best_ap": self.best_ap,
        }
        save_checkpoint(state, is_best, self.file_name, name)

    def resume_train(self):
        args = self.args
        if getattr(args, "resume", False):
            ckpt_path = args.ckpt or os.path.join(
                self.file_name, "latest_ckpt.msgpack")
            ckpt = load_checkpoint(ckpt_path)
            raw = ckpt.get("raw_model", ckpt.get("model"))
            self.state = self.state._replace(
                params=load_matched(self.state.params, raw["params"]),
                batch_stats=load_matched(self.state.batch_stats,
                                         raw.get("batch_stats", {})),
            )
            # restore optimizer state (momentum / MultiSteps accumulators) —
            # ref trainer.py:305-307 loads ckpt["optimizer"]; without this the
            # first post-resume steps lose SGD momentum and accumulation.
            if "opt_state" in ckpt:
                from flax import serialization

                self.state = self.state._replace(
                    opt_state=serialization.from_state_dict(
                        self.state.opt_state, ckpt["opt_state"]))
            # re-seed the EMA shadow from the checkpoint's EMA ("model") tree
            # so early post-resume evals/ckpts don't reflect init weights.
            if self.state.ema is not None and "model" in ckpt:
                shadow = {
                    "params": load_matched(self.state.params,
                                           ckpt["model"]["params"]),
                    "batch_stats": load_matched(
                        self.state.batch_stats,
                        ckpt["model"].get("batch_stats", {})),
                }
                self.state = self.state._replace(
                    ema=self.state.ema._replace(shadow=shadow))
            self.start_epoch = (args.start_epoch
                                if getattr(args, "start_epoch", None)
                                else ckpt.get("start_epoch", 0))
            if self.state.ema is not None:
                # the decay-warmup ramp position (ema.py:48-58) is a function
                # of total updates, not wall epoch — keep it monotonic
                self.state = self.state._replace(ema=self.state.ema._replace(
                    updates=jnp.asarray(
                        self.start_epoch * self.iters_per_epoch, jnp.int32)))
            self.best_ap = ckpt.get("best_ap", 0.0)
            logger.info("resumed from %s at epoch %d", ckpt_path,
                        self.start_epoch)
        elif getattr(args, "ckpt", None):
            ckpt = load_checkpoint(args.ckpt)
            model_vars = ckpt.get("model", ckpt)
            self.state = self.state._replace(
                params=load_matched(self.state.params, model_vars["params"]),
                batch_stats=load_matched(self.state.batch_stats,
                                         model_vars.get("batch_stats", {})))
            logger.info("loaded fine-tune weights from %s", args.ckpt)
