"""Dual console+file logger (reference: NANN_impls/nann/logger.py)."""

from __future__ import annotations

import logging
import sys
from typing import Optional

_FMT = "[%(asctime)s %(name)s %(levelname).1s] %(message)s"


def get_logger(name: str, output: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter(_FMT, datefmt="%H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output:
        fh = logging.FileHandler(output)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
