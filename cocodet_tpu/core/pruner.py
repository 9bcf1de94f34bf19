"""Pruner — iterative structured channel pruning with distillation.

Parity target: ref yolox/core/pruner.py:39-520:
  * student trains with detection loss + attention-transfer distillation
    from a frozen teacher (the init checkpoint), ref pruner.py:118-173;
  * every `prune_interval` fraction of an epoch, per-channel Taylor
    importance is accumulated over the val loader:
        importance = (bn.scale * d bn.scale + bn.bias * d bn.bias)^2
    (ref BaseConv.score, network_blocks.py:86-95), already-pruned channels
    get +inf, all channels are globally sorted and the lowest
    `prune_channels` are masked (ref pruner.py:362-448);
  * pruning writes ChannelMask: scale *= keep, offset += bn.bias * newly
    removed (ref BaseConv.prune, network_blocks.py:97-104);
  * EMA is forced off (ref pruner.py:52).

TPU re-design: importance comes from one jitted grad pass per val batch
(grads of the detection loss wrt BN affine params); mask surgery is a pure
pytree transform keyed on the ``masks`` collection (its structure IS the
prunable-conv set). The teacher forward shares the student graph with
stop_gradient — one compiled program for student+teacher+distill.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flax.traverse_util import flatten_dict, unflatten_dict

from ..models.distill import distiller_loss
from ..ops.losses import yolox_losses
from ..utils.checkpoint import load_checkpoint, load_matched
from ..utils.logger import logger
from .train_state import TrainState, create_train_state
from .trainer import Trainer


def make_distill_train_step(model, teacher_model, optimizer, strides,
                            num_classes=80, iou_type="iou",
                            distill_coefficient=1.0, freeze_optimizer=False,
                            ema_decay=0.9998, use_ema=True):
    """Train step with detection + distillation loss (ref pruner.py:118-173,
    tuner.py:123-146). ``freeze_optimizer`` supports the reference's
    prune_start_epoch gating (optimizer steps suppressed, pruner.py:140-155).
    EMA is updated when the state carries one (the Tuner runs with EMA on;
    the Pruner forces it off, ref pruner.py:52)."""
    from ..utils.ema import ema_update

    @functools.partial(jax.jit, static_argnames=("use_l1", "step_optimizer"))
    def train_step(state: TrainState, teacher_vars, masks, images, labels,
                   use_l1: bool = False, step_optimizer: bool = True):
        def loss_fn(params):
            student_vars = {"params": params, "batch_stats": state.batch_stats}
            if masks:
                student_vars["masks"] = masks
            (outputs, s_taps), mutated = model.apply(
                student_vars, images, train=True, return_taps=True,
                mutable=["batch_stats"])
            det, _ = yolox_losses(outputs, labels, strides=strides,
                                  num_classes=num_classes, use_l1=use_l1,
                                  iou_type=iou_type)
            _, t_taps = teacher_model.apply(teacher_vars, images,
                                            return_taps=True)
            dis = distiller_loss(s_taps, t_taps)
            total = det.total + distill_coefficient * dis["dis_loss"]
            return total, (det, dis, mutated.get("batch_stats", {}))

        (_, (det, dis, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if step_optimizer:
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
        else:
            new_opt, new_params = state.opt_state, state.params
        new_ema = state.ema
        if use_ema and state.ema is not None:
            new_ema = ema_update(
                state.ema,
                {"params": new_params, "batch_stats": new_stats},
                decay=ema_decay)
        new_state = state._replace(params=new_params, batch_stats=new_stats,
                                   opt_state=new_opt, ema=new_ema,
                                   step=state.step + 1)
        metrics = {"loss": det.total, "iou_loss": det.iou,
                   "obj_loss": det.obj, "cls_loss": det.cls,
                   "l1_loss": det.l1,  # 0 until the no-aug phase
                   "dis_loss": dis["dis_loss"],
                   "dis_backbone_loss": dis["dis_backbone_loss"],
                   "dis_fpn_loss": dis["dis_fpn_loss"]}
        return new_state, metrics

    return train_step


# --------------------------------------------------------------------------
# channel-importance scoring + mask surgery (pure pytree transforms)
# --------------------------------------------------------------------------


def make_score_step(model, strides, num_classes=80, iou_type="iou"):
    """One jitted pass: grads of the detection loss wrt params; returns the
    per-channel Taylor importance for every masked conv."""

    @jax.jit
    def score_step(variables, images, labels):
        def loss_fn(params):
            outputs = model.apply(
                {**variables, "params": params}, images, train=False)
            det, _ = yolox_losses(outputs, labels, strides=strides,
                                  num_classes=num_classes, iou_type=iou_type)
            return det.total

        grads = jax.grad(loss_fn)(variables["params"])
        return channel_importance(variables, grads)

    return score_step


def channel_importance(variables: Dict, grads: Dict) -> Dict[Tuple, jnp.ndarray]:
    """importance = (bn.scale*g_scale + bn.bias*g_bias)^2 per masked conv
    (ref network_blocks.py:86-95). Keys are the mask scope paths."""
    params = flatten_dict(variables["params"])
    gflat = flatten_dict(grads)
    masks = flatten_dict(variables.get("masks", {}))
    out = {}
    for path in masks:
        if path[-2:] != ("mask", "scale"):
            continue
        scope = path[:-2]
        bn_scale = params[scope + ("bn", "scale")]
        bn_bias = params[scope + ("bn", "bias")]
        g_scale = gflat[scope + ("bn", "scale")]
        g_bias = gflat[scope + ("bn", "bias")]
        out[scope] = jnp.square(bn_scale * g_scale + bn_bias * g_bias)
    return out


def find_residual_groups(scopes, params: Dict[Tuple, Any]
                         ) -> Dict[Tuple, Tuple[Tuple, ...]]:
    """Tied residual-stream mask groups: {leader -> (member, ...)}.

    A CSP whose conv1 carries a mask is a residual chain (models only mask
    conv1 when shortcut=True): the stream through conv1 and every
    bottleneck conv2 (pre-add) must be pruned jointly for the channel to be
    physically removable. Leader = csp/conv1 scope; members = csp/m*/conv2
    mask scopes. SPP conv1 masks are excluded (no m0 bottleneck)."""
    scopes = set(scopes)
    groups = {}
    for s in scopes:
        if s[-1] != "conv1" or len(s) < 2:
            continue
        csp = s[:-1]
        if csp + ("m0", "conv1", "conv", "kernel") not in params:
            continue  # not a CSP bottleneck chain (e.g. SPP conv1)
        members = []
        i = 0
        while True:
            m = csp + (f"m{i}", "conv2")
            if m not in scopes:
                break
            members.append(m)
            i += 1
        if members:
            groups[s] = tuple(members)
    return groups


def apply_channel_prune(variables: Dict, importance: Dict[Tuple, np.ndarray],
                        prune_channels: int, site_floor: int = 1,
                        max_frac: float = 1.0,
                        normalize: Optional[str] = None) -> Tuple[Dict, int]:
    """Globally sort channel importances (already-pruned = +inf) and mask
    the lowest ``prune_channels`` (ref pruner.py:362-448 +
    network_blocks.py:97-104). Returns (new variables, newly pruned count).

    Residual-stream groups (find_residual_groups) rank as ONE site whose
    score is the sum over tied sites; pruning a group channel zeroes it at
    the leader and every member, and counts as group-size channels toward
    the budget (the reference never prunes residual convs at all).

    Beyond the reference's raw global sort:
      * ``site_floor`` — minimum alive channels a site may keep (the
        reference can prune a conv to zero width, which crashes the slim
        model; 1 mirrors round-1 behavior, 8+ keeps MXU-friendly widths);
      * ``max_frac`` — cap on the fraction of a site's channels that may
        ever be pruned (protects narrow bottlenecks from a few
        high-gradient head towers dominating the global ranking);
      * ``normalize="mean"`` — divide each site's scores by the site's
        alive-mean so the global ranking is scale-free across depths
        (gradient magnitudes differ systematically between FPN levels).
    """
    params = flatten_dict(variables["params"])
    masks = dict(flatten_dict(variables["masks"]))
    # residual-stream groups rank and prune as ONE site: the group score is
    # the sum over tied sites, and zeroing a group channel masks it at the
    # leader (csp conv1) and every member (bottleneck conv2) together
    groups = find_residual_groups(importance.keys(), params)
    member_of = {m: lead for lead, ms in groups.items() for m in ms}

    flat_scores = []
    index = []  # (scope, channel)
    budget: Dict[Tuple, int] = {}  # per-site remaining prunable channels
    weight: Dict[Tuple, int] = {}  # conv channels zeroed per pruned unit
    for scope, imp in importance.items():
        if scope in member_of:
            continue  # ranked via its group leader
        scale = np.asarray(masks[scope + ("mask", "scale")])
        alive_mask = scale > 0.0

        def _norm(a):
            a = np.asarray(a, np.float64)
            if normalize == "mean" and alive_mask.any():
                a = a / (a[alive_mask].mean() + 1e-12)
            return a

        imp = _norm(imp)
        for m in groups.get(scope, ()):
            imp = imp + _norm(importance[m])
        weight[scope] = 1 + len(groups.get(scope, ()))
        imp = np.where(~alive_mask, np.inf, imp)
        # protect the ``site_floor`` best alive channels of each site: a
        # conv must never reach zero width (downstream consumers and the
        # slim model would be ill-formed)
        alive = np.isfinite(imp)
        n_alive = int(alive.sum())
        floor = max(min(site_floor, n_alive), 1)
        if n_alive:
            top = np.argsort(np.where(alive, imp, -np.inf))[-floor:]
            imp[top] = np.inf
        total = scale.shape[0]
        already = total - n_alive
        budget[scope] = max(int(max_frac * total) - already, 0)
        for c in range(imp.shape[0]):
            flat_scores.append(imp[c])
            index.append((scope, c))
    flat_scores = np.asarray(flat_scores)
    order = np.argsort(flat_scores, kind="stable")

    to_prune = []
    n_sel = 0  # conv channels the selection will zero (groups weigh more)
    n_skip_budget = n_skip_overshoot = 0
    for i in order:
        if n_sel >= prune_channels:
            break
        if not np.isfinite(flat_scores[i]):
            continue
        scope, c = index[i]
        if budget[scope] <= 0:
            n_skip_budget += 1
            continue
        if n_sel + weight[scope] > prune_channels:
            n_skip_overshoot += 1
            continue  # a group pick would overshoot; try cheaper sites
        budget[scope] -= 1
        n_sel += weight[scope]
        to_prune.append((scope, c))
    if n_skip_budget or n_skip_overshoot or n_sel < prune_channels:
        # no silent caps: surface why a round pruned fewer than requested
        # (group picks near the budget boundary, or max_frac-starved sites)
        logger.info(
            "prune selection: %d/%d channels selected (%d candidates "
            "skipped by max_frac budget, %d by group-overshoot)",
            n_sel, prune_channels, n_skip_budget, n_skip_overshoot)

    by_scope: Dict[Tuple, list] = {}
    for scope, c in to_prune:
        by_scope.setdefault(scope, []).append(c)

    n_new = 0
    for scope, chans in by_scope.items():
        for site in (scope,) + groups.get(scope, ()):
            scale = np.asarray(masks[site + ("mask", "scale")]).copy()
            offset = np.asarray(masks[site + ("mask", "offset")]).copy()
            bn_bias = np.asarray(params[site + ("bn", "bias")])
            keep = np.ones_like(scale)
            keep[chans] = 0.0
            newly = (1.0 - keep) * scale  # channels removed just now
            offset += bn_bias * newly
            scale *= keep
            masks[site + ("mask", "scale")] = jnp.asarray(scale)
            masks[site + ("mask", "offset")] = jnp.asarray(offset)
            n_new += int(newly.sum())

    new_vars = dict(variables)
    new_vars["masks"] = unflatten_dict(masks)
    return new_vars, n_new


def mask_stats(variables: Dict) -> Dict[str, Tuple[int, int]]:
    """Per-conv (kept, total) channel stats for logging
    (ref pruner.py per-stage channel table)."""
    masks = flatten_dict(variables.get("masks", {}))
    out = {}
    for path, v in masks.items():
        if path[-2:] == ("mask", "scale"):
            arr = np.asarray(v)
            out["/".join(path[:-2])] = (int(arr.sum()), arr.shape[0])
    return out


class Pruner(Trainer):
    """Trainer + teacher distillation + periodic channel pruning."""

    def __init__(self, exp, args):
        super().__init__(exp, args)
        self.prune_interval = getattr(exp, "prune_interval", 0.5)
        self.prune_channels = getattr(exp, "prune_channels", 64)
        self.prune_start_epoch = getattr(exp, "prune_start_epoch", 0)
        # epochs >= prune_end_epoch train WITHOUT new prune events: an
        # in-stage recovery window after the last surgery (the reference
        # prunes to the final iteration and leans entirely on tune.py for
        # recovery, ref pruner.py:362-448; a settling window before the
        # Taylor scores stop moving recovers much of the AP50 drop earlier)
        self.prune_end_epoch = getattr(exp, "prune_end_epoch", None)
        self.score_batches = getattr(exp, "prune_score_batches", 8)
        self.prune_site_floor = getattr(exp, "prune_site_floor", 1)
        self.prune_max_frac = getattr(exp, "prune_max_frac", 1.0)
        self.prune_normalize = getattr(exp, "prune_normalize", None)

    def before_train(self):
        exp = self.exp
        exp.ema = False  # ref pruner.py:52
        self.model = exp.get_model(use_mask=True)
        self.teacher_model = exp.get_model()

        batch_size = self.args.batch_size
        self.train_loader = exp.get_data_loader(
            batch_size=batch_size, no_aug=True, rank=self.rank,
            world_size=jax.process_count(), seed=exp.seed or 0)
        self.iters_per_epoch = max(
            len(self.train_loader.dataset) // batch_size, 1)
        lr = exp.basic_lr_per_img * batch_size
        self.lr_schedule = exp.get_lr_scheduler(lr, self.iters_per_epoch)
        self.optimizer_tx = exp.get_optimizer(batch_size)

        rng = jax.random.PRNGKey(exp.seed or 0)
        sample = jnp.zeros((1, *exp.input_size, 3), jnp.float32)
        init_vars = self.model.init(rng, sample)
        self.masks = init_vars.get("masks", {})
        self.state = create_train_state(self.model, self.optimizer_tx, rng,
                                        sample, use_ema=False,
                                        init_vars=init_vars)

        init_ckpt = getattr(exp, "init_ckpt", None)
        if init_ckpt:
            self._load_init_ckpt(init_ckpt)
        # frozen teacher = init weights (ref pruner.py:180-208)
        self.teacher_vars = {"params": self.state.params,
                             "batch_stats": self.state.batch_stats}

        self.train_step = make_distill_train_step(
            self.model, self.teacher_model, self.optimizer_tx,
            strides=exp.strides, num_classes=exp.num_classes,
            iou_type=exp.iou_type)
        self.score_step = make_score_step(self.model, exp.strides,
                                          exp.num_classes, exp.iou_type)
        self._setup_mesh(batch_size)
        self.evaluator = exp.get_evaluator(batch_size=batch_size)
        if self.eval_sharding is not None and hasattr(self.evaluator,
                                                      "sharding"):
            self.evaluator.sharding = self.eval_sharding
        import random as _random
        self.size_rng = _random.Random((exp.seed or 0) + 1234)
        from ..data.samplers import DevicePrefetcher
        self.prefetcher = DevicePrefetcher(self.train_loader,
                                           sharding=self.data_sharding)
        self.data_iter = self.prefetcher  # has .next()
        logger.info("Pruner init done; %d iters/epoch", self.iters_per_epoch)

    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "masks": self.masks}

    def train_in_iter(self):
        exp = self.exp
        prune_every = max(int(self.iters_per_epoch * self.prune_interval), 1)
        for it in range(self.iters_per_epoch):
            imgs, labels, _, _ = self._next_batch()
            step_opt = self.epoch >= self.prune_start_epoch
            self.state, metrics = self.train_step(
                self.state, self.teacher_vars, self.masks, imgs, labels,
                use_l1=self.use_l1, step_optimizer=step_opt)
            if (it + 1) % exp.print_interval == 0:
                metrics = jax.device_get(metrics)
                global_iter = self.epoch * self.iters_per_epoch + it
                self.meter.update(
                    lr=float(jnp.asarray(self.lr_schedule(
                        jnp.asarray(global_iter, jnp.float32)))),
                    **{k: float(v) for k, v in metrics.items()})
                self._log_progress(it, exp.input_size)
            prune_open = (self.prune_end_epoch is None
                          or self.epoch < self.prune_end_epoch)
            if prune_open and (it + 1) % prune_every == 0:
                self.prune()

    def prune(self):
        """Accumulate importance over score batches, prune globally."""
        acc: Optional[Dict] = None
        for _ in range(self.score_batches):
            imgs, labels, _, _ = self._next_batch()
            imp = self.score_step(self._variables(), imgs, labels)
            imp = jax.device_get(imp)
            acc = imp if acc is None else {
                k: acc[k] + imp[k] for k in imp}
        new_vars, n_new = apply_channel_prune(
            self._variables(), acc, self.prune_channels,
            site_floor=self.prune_site_floor, max_frac=self.prune_max_frac,
            normalize=self.prune_normalize)
        self.masks = new_vars["masks"]
        stats = mask_stats(new_vars)
        kept = sum(k for k, _ in stats.values())
        total = sum(t for _, t in stats.values())
        logger.info("pruned %d new channels; kept %d/%d (%.1f%%)",
                    n_new, kept, total, 100.0 * kept / max(total, 1))

    def eval_variables(self):
        return self._variables()
