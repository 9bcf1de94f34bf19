"""TrainerSynFlow — SynFlow unstructured pruning schedule inside training.

Parity target: ref yolox/core/trainer_synflow.py (region :241-314):
iteratively for i in 1..prune_iters (100):
  - strip weight signs (|w|), forward an all-ones input, sum the outputs,
    backprop;
  - per-element score = |w * dL/dw|;
  - keep the global top `prune_ratio^(i/iters)` fraction -> 0/1 conv_mask;
masks take effect from `prune_epoch` on (masked convs multiply kernel by
mask at every use — blocks.Conv2d weight_mask path).

TPU re-design: each SynFlow iteration is ONE jitted grad pass over the
masked-|w| network; mask updates are a pure pytree transform over the
``masks`` collection.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from ..utils.logger import logger
from .trainer import Trainer


def make_synflow_score_step(model, input_size):
    """One jitted SynFlow scoring pass."""

    @jax.jit
    def score_step(variables):
        abs_params = jax.tree_util.tree_map(jnp.abs, variables["params"])
        ones = jnp.ones((1, *input_size, 3), jnp.float32)

        def out_sum(params):
            vs = dict(variables, params=params)
            outputs = model.apply(vs, ones)
            return sum(jnp.sum(o[k].astype(jnp.float32))
                       for o in outputs for k in ("reg", "obj", "cls"))

        grads = jax.grad(out_sum)(abs_params)
        return jax.tree_util.tree_map(
            lambda w, g: jnp.abs(w * g), abs_params, grads)

    return score_step


def synflow_update_masks(variables: Dict, scores: Dict,
                         keep_fraction: float) -> Dict:
    """Global threshold on scores of masked kernels -> new 0/1 conv_masks."""
    masks = dict(flatten_dict(variables["masks"]))
    sflat = flatten_dict(scores)

    mask_keys = [k for k in masks if k[-1] == "conv_mask"]
    shards = [np.asarray(sflat[k[:-1] + ("kernel",)]) for k in mask_keys]
    all_scores = np.concatenate([s.ravel() for s in shards])
    n_keep = max(int(round(all_scores.size * keep_fraction)), 1)
    # exact top-n selection: tie- and zero-score-safe (a plain threshold
    # keeps everything when many scores tie at the cut)
    keep_flat = np.zeros(all_scores.size, bool)
    keep_flat[np.argpartition(-all_scores, n_keep - 1)[:n_keep]] = True

    offset = 0
    for k, s in zip(mask_keys, shards):
        n = s.size
        masks[k] = jnp.asarray(
            keep_flat[offset:offset + n].reshape(s.shape).astype(np.float32))
        offset += n
    out = dict(variables)
    out["masks"] = unflatten_dict(masks)
    return out


class TrainerSynFlow(Trainer):
    """Trainer that runs the SynFlow schedule at ``prune_epoch``."""

    def __init__(self, exp, args):
        super().__init__(exp, args)
        self.prune_iters = getattr(exp, "prune_iters", 100)
        self.prune_ratio = getattr(exp, "prune_ratio", 0.5)
        self.prune_epoch = getattr(exp, "prune_epoch", 10)
        self._synflow_done = False

    def before_train(self):
        self.exp.get_model = _with_weight_mask(self.exp.get_model)
        super().before_train()
        rng = jax.random.PRNGKey(self.exp.seed or 0)
        sample = jnp.zeros((1, *self.exp.input_size, 3), jnp.float32)
        init_vars = self.model.init(rng, sample)
        self.masks = init_vars.get("masks", {})
        self.score_step = make_synflow_score_step(self.model,
                                                  self.exp.input_size)

    def _variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "masks": self.masks}

    def before_epoch(self):
        super().before_epoch()
        if self.epoch >= self.prune_epoch and not self._synflow_done:
            self.apply_synflow()

    def apply_synflow(self):
        logger.info("SynFlow: %d iterations to %.0f%% sparsity",
                    self.prune_iters, 100 * (1 - self.prune_ratio))
        variables = self._variables()
        for i in range(1, self.prune_iters + 1):
            keep = self.prune_ratio ** (i / self.prune_iters)
            scores = jax.device_get(self.score_step(variables))
            variables = synflow_update_masks(variables, scores, keep)
        self.masks = variables["masks"]
        self._synflow_done = True
        total = sum(np.asarray(m).size
                    for k, m in flatten_dict(self.masks).items()
                    if k[-1] == "conv_mask")
        kept = sum(int(np.asarray(m).sum())
                   for k, m in flatten_dict(self.masks).items()
                   if k[-1] == "conv_mask")
        logger.info("SynFlow done: kept %d/%d weights (%.1f%%)",
                    kept, total, 100.0 * kept / max(total, 1))

    def eval_variables(self):
        base = super().eval_variables()
        return {**base, "masks": self.masks}


def _with_weight_mask(get_model):
    def wrapped(*a, **kw):
        kw.setdefault("weight_mask", True)
        return get_model(*a, **kw)
    return wrapped
