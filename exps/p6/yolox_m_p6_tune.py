"""Phase-2 fine-tune config: init from phase-1, 100 ep @896, GIoU
(parity: ref exps/p6/yolox_m_p6_tune.py:25-56)."""

import os

from cocodet_tpu.exp import CustomP6Exp


class Exp(CustomP6Exp):
    def __init__(self):
        super().__init__()
        self.depth = 0.67
        self.width = 0.75
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

        self.init_ckpt = "weights/pre_m_p6.msgpack"

        self.data_num_workers = 4
        self.input_size = (896, 896)
        self.multiscale_range = (-4, 1)
        self.multiscale_step = 32

        self.warmup_epochs = 1
        self.max_epoch = 100
        self.basic_lr_per_img = 0.001 / 64.0
        self.no_aug_epochs = 15
        self.ema = True
        self.ema_momentum = 0.9999

        self.iou_type = "giou"
        self.weight_decay = 5e-4
        self.print_interval = 25
        self.eval_interval = 5

        self.test_size = (896, 896)
        self.test_conf = 0.001
        self.nms_threshold = 0.65
