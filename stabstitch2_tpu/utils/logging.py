"""Structured logging: one logger for the framework, env-tunable level."""

from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "stabstitch2_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("STABSTITCH_LOGLEVEL", "INFO"))
        logger.propagate = False
    return logger
