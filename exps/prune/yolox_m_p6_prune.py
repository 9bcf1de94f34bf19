"""Channel-pruning run config (parity: ref exps/prune/yolox_x.py pattern:
Pruner hyperparams on top of the model exp)."""

import os

from cocodet_tpu.exp import CustomP6Exp


class Exp(CustomP6Exp):
    def __init__(self):
        super().__init__()
        self.depth = 0.67
        self.width = 0.75
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

        self.init_ckpt = "weights/best_ckpt.msgpack"  # teacher + student init
        self.max_epoch = 30
        self.no_aug_epochs = 30          # pruning runs without mosaic
        self.basic_lr_per_img = 0.001 / 64.0
        self.warmup_epochs = 0
        self.ema = False                  # forced off by Pruner anyway

        # pruning schedule (ref pruner.py:362-448 usage)
        self.prune_interval = 0.5         # fraction of an epoch between prunes
        self.prune_channels = 64          # channels removed per prune event
        self.prune_start_epoch = 0
        self.prune_end_epoch = None       # stop surgeries here; epochs after
        # are an in-stage recovery window (None = prune to the end, the
        # reference's behavior)
        self.prune_score_batches = 8

        # ranking-quality knobs (beyond the reference's raw global sort):
        self.prune_site_floor = 8         # min alive channels per conv site
        self.prune_max_frac = 0.75        # cap pruned fraction per site
        self.prune_normalize = "mean"     # scale-free cross-site ranking

        self.eval_interval = 1
