"""Tuner — fine-tune runtime with optional distillation.

Parity target: ref yolox/core/tuner.py:37-416: a Trainer whose
train_one_iter adds attention-transfer distillation when
``distill_coefficient > 0`` (ref tuner.py:123-146), teacher = the init
checkpoint (ref tuner.py:197-210), and optimizer stepping gated by
``tune_start_epoch``.
"""

from __future__ import annotations

import random as _random

import jax
import jax.numpy as jnp

from ..data.samplers import DevicePrefetcher
from ..utils.logger import logger
from .pruner import make_distill_train_step
from .train_state import create_train_state, make_train_step
from .trainer import Trainer


class Tuner(Trainer):
    def __init__(self, exp, args):
        super().__init__(exp, args)
        self.distill_coefficient = getattr(exp, "distill_coefficient", 0.0)
        self.tune_start_epoch = getattr(exp, "tune_start_epoch", 0)

    def before_train(self):
        super().before_train()
        if self.distill_coefficient > 0:
            exp = self.exp
            teacher_ckpt = getattr(exp, "teacher_ckpt", None)
            if teacher_ckpt:
                # distill from a SEPARATE (typically dense, pre-prune)
                # checkpoint: the recovery tune then pulls the pruned
                # student back toward the unpruned model's features instead
                # of the pruned init's (beyond the reference, whose teacher
                # is always the init ckpt, ref tuner.py:197-210)
                from ..utils.checkpoint import load_checkpoint

                ckpt = load_checkpoint(teacher_ckpt)
                model_vars = ckpt.get("model", ckpt)
                self.teacher_model = exp.get_model()
                self.teacher_vars = {
                    "params": model_vars["params"],
                    "batch_stats": model_vars.get("batch_stats", {})}
                logger.info("Tuner: teacher from %s", teacher_ckpt)
            else:
                # teacher = the init checkpoint (ref tuner.py:197-210); when
                # the init ckpt is a pruned model, the teacher mirrors the
                # masked student so it computes the function the ckpt
                # describes
                masks = getattr(self, "masks", None)
                self.teacher_model = exp.get_model(use_mask=bool(masks))
                self.teacher_vars = {"params": self.state.params,
                                     "batch_stats": self.state.batch_stats}
                if masks:
                    self.teacher_vars["masks"] = masks
            self.distill_step = make_distill_train_step(
                self.model, self.teacher_model, self.optimizer_tx,
                strides=exp.strides, num_classes=exp.num_classes,
                iou_type=exp.iou_type,
                distill_coefficient=self.distill_coefficient,
                ema_decay=exp.ema_momentum, use_ema=exp.ema)
            logger.info("Tuner: distillation on (coef=%.3g)",
                        self.distill_coefficient)

    def train_in_iter(self):
        if self.distill_coefficient <= 0:
            return super().train_in_iter()
        exp = self.exp
        for it in range(self.iters_per_epoch):
            imgs, labels, _, _ = self._next_batch()
            self.state, metrics = self.distill_step(
                self.state, self.teacher_vars,
                getattr(self, "masks", None) or {}, imgs, labels,
                use_l1=self.use_l1,
                step_optimizer=self.epoch >= self.tune_start_epoch)
            if (it + 1) % exp.print_interval == 0:
                metrics = jax.device_get(metrics)
                global_iter = self.epoch * self.iters_per_epoch + it
                self.meter.update(
                    lr=float(jnp.asarray(self.lr_schedule(
                        jnp.asarray(global_iter, jnp.float32)))),
                    **{k: float(v) for k, v in metrics.items()})
                self._log_progress(it, exp.input_size)
