"""Process environment configuration.

Parity target: ref yolox/utils/setup_env.py:16-77 (configure_nccl: IB HCA
autodetect — GPU-specific, no TPU equivalent; configure_omp; configure_module:
ulimit + cv2 thread/OpenCL off). The TPU analogues configured here:
  * cv2 threading off (host CPU feeds the TPU; worker threads contend),
  * file-descriptor soft limit raise (many-worker data loading),
  * optional XLA flag injection helper for perf experiments.
"""

from __future__ import annotations

import os
import resource
from typing import Dict, Optional

from .logger import logger


def configure_omp(num_threads: int = 1):
    """OMP thread cap (ref setup_env.py:28-48): host-side numpy/cv2 work
    should not oversubscribe the data-loading cores."""
    if "OMP_NUM_THREADS" not in os.environ:
        os.environ["OMP_NUM_THREADS"] = str(num_threads)


def configure_module(ulimit_value: int = 8192):
    """cv2 + ulimit tuning (ref setup_env.py:51-77)."""
    try:
        soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        resource.setrlimit(resource.RLIMIT_NOFILE,
                           (max(soft, min(ulimit_value, hard)), hard))
    except Exception as e:
        logger.debug("ulimit raise failed: %s", e)
    try:
        import cv2

        cv2.setNumThreads(0)
        try:
            cv2.ocl.setUseOpenCL(False)
        except Exception:
            pass
    except ImportError:
        pass


def add_xla_flags(flags: Dict[str, Optional[str]]):
    """Append XLA flags before backend init (must run before first jax use)."""
    existing = os.environ.get("XLA_FLAGS", "")
    parts = [existing] if existing else []
    for k, v in flags.items():
        parts.append(f"--{k}" if v is None else f"--{k}={v}")
    os.environ["XLA_FLAGS"] = " ".join(parts)
