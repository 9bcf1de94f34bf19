"""Standard YOLOX-S (registry twin of ref exps/default/yolox_s.py)."""

import os

from cocodet_tpu.exp import Exp as BaseE


class Exp(BaseE):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
