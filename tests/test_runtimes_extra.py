"""Tuner and TrainerSynFlow full-loop smokes on synthetic COCO."""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_fake_coco  # noqa: E402
from test_runtimes import Args, TinyExp  # noqa: E402


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_fake_coco(str(tmp_path_factory.mktemp("coco")), n_images=8)


def test_tuner_distill_epoch(coco_root, tmp_path):
    from cocodet_tpu.core.tuner import Tuner

    exp = TinyExp(coco_root)
    exp.output_dir = str(tmp_path)
    exp.distill_coefficient = 1.0
    exp.ema = False
    t = Tuner(exp, Args())
    t.train()
    assert int(t.state.step) == t.iters_per_epoch
    assert np.isfinite(t.meter["loss"].latest)
    assert t.meter["dis_loss"].latest >= 0.0


def test_tuner_resumes_pruned_masks(coco_root, tmp_path):
    """The recovery fine-tune must rebuild the MASKED model and hold the
    pruned channels fixed (ref yolox/core/tuner.py:197-210: tune resumes the
    masked model from the prune checkpoint)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    from cocodet_tpu.core.tuner import Tuner
    from cocodet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    exp = TinyExp(coco_root)
    exp.output_dir = str(tmp_path)
    model = exp.get_model(use_mask=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    masks = dict(flatten_dict(variables["masks"]))
    # prune a couple of channels in the first mask site
    key = next(k for k in masks if k[-2:] == ("mask", "scale"))
    scale = np.asarray(masks[key]).copy()
    scale[:2] = 0.0
    masks[key] = jnp.asarray(scale)
    ckpt = {"model": {"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {}),
                      "masks": unflatten_dict(masks)}}
    save_checkpoint(ckpt, False, str(tmp_path), "pruned")

    exp2 = TinyExp(coco_root)
    exp2.output_dir = str(tmp_path)
    exp2.init_ckpt = os.path.join(str(tmp_path), "pruned_ckpt.msgpack")
    exp2.distill_coefficient = 1.0
    exp2.ema = True  # the EMA shadow is what eval/save read — cover it
    t = Tuner(exp2, Args())
    t.train()
    # the pruned channels survived the tune epoch untouched
    got = np.asarray(flatten_dict(t.masks)[key])
    assert got[0] == 0.0 and got[1] == 0.0 and got[2:].all()
    # the EMA shadow was (a) re-seeded from the init ckpt, not the random
    # init, and (b) updated by the distill train step: after an epoch at
    # the ramped decay it must track the live params tightly
    assert int(t.state.ema.updates) == t.iters_per_epoch
    shadow = flatten_dict(t.state.ema.shadow["params"])
    live = flatten_dict(t.state.params)
    for k2 in list(live)[:5]:
        np.testing.assert_allclose(np.asarray(shadow[k2]),
                                   np.asarray(live[k2]), atol=1e-2)
    # and the saved checkpoint carries the masks forward for compression
    saved = load_checkpoint(os.path.join(t.file_name,
                                         "latest_ckpt.msgpack"))
    assert "masks" in saved["model"]
    assert np.isfinite(t.meter["loss"].latest)


def test_synflow_trainer_epoch(coco_root, tmp_path):
    from flax.traverse_util import flatten_dict

    from cocodet_tpu.core.trainer_synflow import TrainerSynFlow

    exp = TinyExp(coco_root)
    exp.output_dir = str(tmp_path)
    exp.ema = False
    exp.prune_iters = 2
    exp.prune_ratio = 0.5
    exp.prune_epoch = 0  # prune before the first epoch
    t = TrainerSynFlow(exp, Args())
    t.train()
    assert t._synflow_done
    masks = flatten_dict(t.masks)
    total = sum(np.asarray(m).size for k, m in masks.items()
                if k[-1] == "conv_mask")
    kept = sum(np.asarray(m).sum() for k, m in masks.items()
               if k[-1] == "conv_mask")
    assert abs(kept / total - 0.5) < 0.02, kept / total
    assert np.isfinite(t.meter["loss"].latest)


def test_tuner_dense_teacher_ckpt(coco_root, tmp_path):
    """exp.teacher_ckpt: the Tuner distills from a separate (dense)
    checkpoint instead of its own init — the recovery-tune recipe where the
    teacher is the pre-prune phase-2 model."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from cocodet_tpu.core.tuner import Tuner
    from cocodet_tpu.utils.checkpoint import save_checkpoint

    exp0 = TinyExp(coco_root)
    teacher_vars = exp0.get_model().init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)), train=False)
    save_checkpoint(
        {"model": {"params": teacher_vars["params"],
                   "batch_stats": teacher_vars.get("batch_stats", {})}},
        False, str(tmp_path), "teacher")

    exp = TinyExp(coco_root)
    exp.output_dir = str(tmp_path)
    exp.distill_coefficient = 1.0
    exp.ema = False
    exp.teacher_ckpt = os.path.join(str(tmp_path), "teacher_ckpt.msgpack")
    t = Tuner(exp, Args())
    t.train()
    assert np.isfinite(t.meter["loss"].latest)
    assert t.meter["dis_loss"].latest > 0.0
    # the teacher really is the saved ckpt, not the student's init
    want = flatten_dict(teacher_vars["params"])
    got = flatten_dict(t.teacher_vars["params"])
    k = next(iter(want))
    np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]))
    student = flatten_dict(t.state.params)
    assert not np.allclose(np.asarray(student[k]), np.asarray(want[k]))
