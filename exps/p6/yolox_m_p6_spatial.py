"""YOLOX-M-P6 phase-1 training on a 2-D (data, space) mesh.

The measured single-chip wall: with on-device mosaic and mosaic-density
labels (max_labels 120) the b128@640 train step needs a 14.7 GB program
vs the 16 GB v5e (ROADMAP.md "device-mosaic memory envelope"), so the
TPU-optimal batch only fits multi-chip.  This exp shards image HEIGHT
over a second mesh axis (exp.spatial_devices -> parallel.make_mesh_2d):
per-device activation memory drops ~2x with NO semantic change (GSPMD
conv halos; f64 grad parity in tests/spatial_parity_f64.py).

Multiscale runs at stride-128 granularity because every training size
must keep >=2 evenly-divided feature-map rows per space device at the
deepest stride-64 level (the measured XLA SPMD backward boundary —
Trainer._check_spatial_sizes): buckets 640/768/896 all satisfy
H % (64*2) == 0.

Run on a multi-chip slice (e.g. v5e-8 -> (4 data, 2 space) mesh):
  python tools/train.py -f exps/p6/yolox_m_p6_spatial.py -b 128
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from yolox_m_p6 import Exp as _BaseExp  # noqa: E402


class Exp(_BaseExp):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(
            os.path.realpath(__file__))[1].split(".")[0]
        # 2 spatial columns; the data axis takes the remaining devices
        self.spatial_devices = 2
        # decode+RNG stay on host, mosaic/affine/mixup/letterbox/HSV/flip
        # run as device programs (the 1-core-host input wall, ROADMAP.md)
        self.device_mosaic = True
        # stride-128 multiscale so every bucket passes the spatial guard
        self.multiscale_step = 128
        self.multiscale_range = (-1, 1)  # 640 / 768 / 896
