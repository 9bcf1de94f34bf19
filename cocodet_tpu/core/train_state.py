"""Train state + the jitted train step (the hot loop).

Parity target: ref yolox/core/trainer.py:109-148 (train_one_iter): forward,
loss, AMP backward, optimizer step, EMA update, LR schedule.

TPU re-design:
  * the whole iteration — forward, SimOTA, losses, backward, SGD update,
    EMA — is ONE jit-compiled program; on a mesh the batch is sharded over
    the "data" axis and XLA inserts the gradient/BN psums over ICI
    (replacing DDP/NCCL, ref trainer.py:194-195);
  * bf16 compute with fp32 params/grad accumulation replaces torch AMP +
    GradScaler (bf16 needs no loss scaling);
  * gradient accumulation uses optax.MultiSteps (ref num_accumulate,
    trainer.py:124-141);
  * multiscale resize is a separate tiny jitted resize per static size
    bucket (ref random_resize + GPU interpolate, yolox_base.py:185-222).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.losses import yolox_losses
from ..utils.ema import EMAState, ema_init, ema_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[EMAState]
    step: jnp.ndarray


def create_train_state(model, optimizer, rng, sample_batch,
                       use_ema: bool = True, init_vars=None) -> TrainState:
    if init_vars is None:
        init_vars = model.init(rng, sample_batch, train=False)
    params = init_vars["params"]
    batch_stats = init_vars.get("batch_stats", {})
    opt_state = optimizer.init(params)
    ema = ema_init({"params": params, "batch_stats": batch_stats}) if use_ema else None
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, ema=ema,
                      step=jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    optimizer,
    strides: Sequence[int],
    num_classes: int = 80,
    iou_type: str = "iou",
    ema_decay: float = 0.9998,
    use_ema: bool = True,
    donate: bool = True,
    remat: bool = False,
    simota_bf16: bool = False,
) -> Callable:
    """Build the jitted train step. ``use_l1`` is a static argument — the
    no-aug phase recompiles once when it flips (ref trainer.py:219-228).

    remat: rematerialize the model forward in the backward pass
    (``jax.checkpoint``), trading ~one extra forward of FLOPs for the
    activation memory.  Measured need: at 640px with mosaic-density
    labels (G=120) the b128 step's 14.7G program exceeds the 16G v5e
    (ROADMAP.md "device-mosaic memory envelope") — remat buys the
    batch-size headroom back on memory-bound operating points.

    simota_bf16: compute the SimOTA (B, G, A) cost/IoU matrices in bf16
    (see ops/simota.assign_single) — an approximation of the label
    ASSIGNMENT only (stop-gradient region, targets stay f32), targeting
    the loss stage's HBM traffic.  Default off = exact reference math.
    """

    @functools.partial(jax.jit, static_argnames=("use_l1",),
                       donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, images, labels, use_l1: bool = False,
                   masks=None):
        def apply_fn(params, imgs):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if masks:
                variables["masks"] = masks
            return model.apply(
                variables, imgs, train=True, mutable=["batch_stats"])

        if remat:
            apply_fn = jax.checkpoint(apply_fn)

        def loss_fn(params):
            outputs, mutated = apply_fn(params, images)
            losses, _ = yolox_losses(
                outputs, labels, strides=strides, num_classes=num_classes,
                use_l1=use_l1, iou_type=iou_type,
                simota_dtype=jnp.bfloat16 if simota_bf16 else jnp.float32)
            return losses.total, (losses, mutated.get("batch_stats", {}))

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema
        if use_ema and state.ema is not None:
            new_ema = ema_update(
                state.ema,
                {"params": new_params, "batch_stats": new_stats},
                decay=ema_decay)

        new_state = TrainState(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, ema=new_ema, step=state.step + 1)
        metrics = {
            "loss": losses.total, "iou_loss": losses.iou,
            "obj_loss": losses.obj, "cls_loss": losses.cls,
            "l1_loss": losses.l1, "num_fg_per_gt": losses.num_fg_per_gt,
        }
        return new_state, metrics

    return train_step


@functools.partial(jax.jit, static_argnames=("size",))
def resize_batch(images: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear device-side resize to a multiscale bucket
    (ref exp.preprocess, yolox_base.py:215-222)."""
    b, h, w, c = images.shape
    if (h, w) == tuple(size):
        return images
    return jax.image.resize(images, (b, size[0], size[1], c), method="bilinear")
