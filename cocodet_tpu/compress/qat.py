"""Quantization-aware fine-tuning (QAT) over the fused/slim deployment zoo.

PTQ (compress/quantize.py) is accuracy-neutral on the synthetic chain, but
post-training rounding has no recourse when a layer's weight distribution
is quantization-hostile — the standard recovery is a short fine-tune with
the int8 rounding simulated in the forward pass (fake-quant with a
straight-through estimator) so SGD absorbs the rounding error into the
surviving precision.  This module adds that recovery stage on top of the
existing PTQ machinery:

  1. calibrate activation scales exactly like PTQ (quantize.calibrate);
  2. build the model with ``quant="qat"`` (models/blocks.py Conv2d):
     float kernels fake-quantized per-out-channel on the fly, activations
     fake-quantized with the frozen calibrated scales — the simulated
     numerics match the deployed s8xs8->s32 graph bit-for-bit;
  3. fine-tune a few epochs with the detection loss (no BN exists in the
     fused topology, so the step is a plain param/opt update);
  4. ``requantize`` snapshots the fine-tuned float kernels to int8 with the
     same absmax/127 recipe the forward simulated — the exported w8a8
     artifact computes exactly what training saw.

Extends the reference's compression identity (ref 01_mask_generator.py,
yolox/core/tuner.py:37-416 — prune + recovery fine-tune) to the
quantization axis: PTQ is the reference-analogue offline transform, QAT is
its recovery-tune counterpart.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from ..ops.losses import yolox_losses
from ..utils.ema import ema_update
from .quantize import quantize_weights


def make_qat_step(model, optimizer, strides: Sequence[int],
                  num_classes: int = 80, iou_type: str = "giou",
                  ema_decay: float = 0.0, donate: bool = True) -> Callable:
    """Jitted QAT fine-tune step for a ``quant="qat"`` fused model.

    Differences from core.train_state.make_train_step: no BN collection
    (fused topology), and the frozen "quant" collection (activation
    scales) rides along as a step argument.

    ema_decay > 0 additionally maintains an EMA shadow of the params
    (pass/receive it as the ``ema`` step argument and deploy the shadow):
    the slim checkpoints this stage fine-tunes are themselves EMA/distill
    optima, and raw SGD steps walk off them — the same pathology the
    prune-recovery Tuner hit before its EMA fix (ROADMAP round-2 notes).
    """

    @functools.partial(jax.jit, static_argnames=("use_l1",),
                       donate_argnums=(0, 1, 2) if donate else ())
    def qat_step(params, opt_state, ema, quant, images, labels,
                 use_l1: bool = True):
        def loss_fn(p):
            outputs = model.apply({"params": p, "quant": quant}, images,
                                  train=True)
            losses, _ = yolox_losses(
                outputs, labels, strides=strides, num_classes=num_classes,
                use_l1=use_l1, iou_type=iou_type)
            return losses.total, losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if ema_decay > 0.0 and ema is not None:
            ema = ema_update(ema, new_params, decay=ema_decay)
        metrics = {"loss": losses.total, "iou_loss": losses.iou,
                   "obj_loss": losses.obj, "cls_loss": losses.cls,
                   "l1_loss": losses.l1}
        return new_params, new_opt_state, ema, metrics

    return qat_step


def act_scale_tree(quant: Dict) -> Dict:
    """Strip a "quant" collection down to its act_scale leaves (drops any
    stale w_scale entries) — the shape quantize_weights expects."""
    flat = flatten_dict(quant)
    return unflatten_dict(
        {p: v for p, v in flat.items() if p[-1] == "act_scale"})


def requantize(params: Dict, quant: Dict) -> Tuple[Dict, Dict]:
    """Snapshot QAT-fine-tuned float kernels to the deployment int8 format.

    Returns (params with int8 kernels, full "quant" collection with fresh
    per-channel w_scale + the frozen act_scale).  Bit-faithful to what the
    QAT forward simulated: same absmax/127 per-out-channel recipe
    (models/blocks.py Conv2d quant="qat" vs quantize.quantize_weights).
    """
    qtree = act_scale_tree(quant)
    # Per-channel act_scale vectors are supported end-to-end (round 4):
    # quantize_weights folds each vector into its kernel before the
    # per-cout quantization, which is exactly the grid the QAT forward
    # simulated (models/blocks.py quant="qat" folds the same vector and
    # fake-quants the folded kernel).
    qvars, quant_out = quantize_weights({"params": params}, qtree)
    return qvars["params"], quant_out
