"""Logging setup — loguru-compatible surface on stdlib logging.

Parity target: ref yolox/utils/logger.py:27-95 (setup_logger: rank-0-only
stderr+file sinks). loguru is not in this image, so a thin shim provides the
``logger.info/...`` API the rest of the framework (and users of the
reference) expect.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_FMT = "%(asctime)s | %(levelname)-7s | %(name)s:%(lineno)d - %(message)s"

logger = logging.getLogger("cocodet_tpu")


def setup_logger(save_dir: Optional[str] = None, rank: int = 0,
                 filename: str = "log.txt", mode: str = "a",
                 level: int = logging.INFO) -> logging.Logger:
    """Install rank-0-only console + file handlers (ref logger.py:52-95)."""
    logger.handlers.clear()
    logger.setLevel(level)
    logger.propagate = False
    if rank != 0:
        logger.addHandler(logging.NullHandler())
        return logger

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(console)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, filename), mode=mode)
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    return logger


# default console handler so library use logs out of the box
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
