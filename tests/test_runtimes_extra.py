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
