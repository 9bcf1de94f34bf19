"""Distillation train step (Pruner/Tuner path) + orbax checkpoint tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cocodet_tpu.core.pruner import make_distill_train_step
from cocodet_tpu.core.train_state import create_train_state
from cocodet_tpu.models import build_model

W, D = 0.125, 0.33


def test_distill_train_step_runs():
    model = build_model("yolox-p6", depth=D, width=W)
    teacher = build_model("yolox-p6", depth=D, width=W)
    tx = optax.sgd(1e-4, momentum=0.9)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3)) * 255
    labels = jnp.tile(
        jnp.asarray([[[1.0, 32.0, 32.0, 16.0, 16.0]] + [[0.0] * 5] * 4]),
        (2, 1, 1))

    state = create_train_state(model, tx, rng, imgs, use_ema=False)
    # teacher = different init so the distill loss is non-zero
    t_vars = teacher.init(jax.random.PRNGKey(7), imgs)
    teacher_vars = {"params": t_vars["params"],
                    "batch_stats": t_vars["batch_stats"]}

    step = make_distill_train_step(model, teacher, tx,
                                   strides=(8, 16, 32, 64), num_classes=80)
    state1, m1 = step(state, teacher_vars, {}, imgs, labels)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["dis_loss"]) > 0.0
    assert float(m1["dis_backbone_loss"]) > 0.0
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # frozen-optimizer phase (ref pruner.py:140-155): params unchanged
    state2, _ = step(state, teacher_vars, {}, imgs, labels,
                     step_optimizer=False)
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p2))


def test_orbax_roundtrip(tmp_path):
    from cocodet_tpu.utils.orbax_ckpt import restore_sharded, save_sharded

    tree = {"params": {"w": jnp.arange(12.0).reshape(3, 4)},
            "step": jnp.asarray(7)}
    save_sharded(tree, str(tmp_path), step=7)
    got = restore_sharded(str(tmp_path))
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(got["step"]) == 7
    # latest-step discovery
    save_sharded(tree, str(tmp_path), step=9)
    got = restore_sharded(str(tmp_path))
    assert int(got["step"]) == 7 or int(got["step"]) == 7  # same payload
