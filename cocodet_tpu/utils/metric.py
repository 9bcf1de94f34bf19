"""Training meters + device-memory gauges.

Parity target: ref yolox/utils/metric.py:21-122 (AverageMeter windowed
deque, MeterBuffer, gpu_mem_usage/occupy_mem). The TPU analogue of the VRAM
gauge reads jax device memory stats; "occupy_mem" has no TPU equivalent
(XLA preallocates HBM) and is intentionally absent.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    """Windowed running average (ref metric.py:21-60)."""

    def __init__(self, window_size: int = 50):
        self._window = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        value = float(value)
        self._window.append(value)
        self._total += value
        self._count += 1

    @property
    def median(self) -> float:
        return float(np.median(self._window)) if self._window else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self._window)) if self._window else 0.0

    @property
    def global_avg(self) -> float:
        return self._total / max(self._count, 1)

    @property
    def latest(self) -> float:
        return self._window[-1] if self._window else 0.0

    def reset(self):
        self._window.clear()
        self._total = 0.0
        self._count = 0

    def clear(self):
        self._window.clear()


class MeterBuffer(defaultdict):
    """Dict of AverageMeters with key filtering (ref metric.py:90-122)."""

    def __init__(self, window_size: int = 20):
        super().__init__(functools.partial(AverageMeter, window_size))

    def update(self, values: Optional[Dict] = None, **kwargs):
        values = dict(values or {}, **kwargs)
        for k, v in values.items():
            self[k].update(v)

    def get_filtered_meter(self, filter_key: str = "time") -> Dict[str, AverageMeter]:
        return {k: v for k, v in self.items() if filter_key in k}

    def reset_filtered(self, filter_key: str):
        for v in self.get_filtered_meter(filter_key).values():
            v.reset()

    def clear_meters(self):
        for v in self.values():
            v.clear()


def device_mem_usage_mb(device=None) -> float:
    """Peak device memory in MB (TPU analogue of ref gpu_mem_usage)."""
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**20
    except Exception:
        return 0.0


class Timer:
    """Phase timer; call ``tic``/``toc(name)`` around host-blocking points."""

    def __init__(self):
        self._t = time.perf_counter()
        self.meters = MeterBuffer()

    def tic(self):
        self._t = time.perf_counter()

    def toc(self, name: str) -> float:
        dt = time.perf_counter() - self._t
        self.meters.update({name: dt})
        self._t = time.perf_counter()
        return dt
