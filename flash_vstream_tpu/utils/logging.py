"""Logging utilities.

Rebuild of build_logger (Flash-VStream-LLaVA/flash_vstream/utils.py:19-59):
console + optional rotating file handler. The reference's multiprocess
QueueHandler/listener machinery (cli_video_stream.py:109-135) is unnecessary
in the single-process runtime and intentionally absent.
"""
from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Optional

_FMT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"


def build_logger(name: str, log_file: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(sh)
    if log_file and not any(isinstance(h, logging.handlers.TimedRotatingFileHandler)
                            for h in logger.handlers):
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            log_file, when="D", utc=True)
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    return logger


def disable_progress_noise():
    """Quiet noisy third-party loggers (disable_torch_init analog)."""
    for noisy in ("jax._src.xla_bridge", "urllib3", "PIL"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
