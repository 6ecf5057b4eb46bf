"""Logging setup — the seconohe.initialize_logger equivalent.

Parity with the reference (SURVEY §5.5): a root framework logger with
per-module children, verbosity via the FLOAT_TPU_DEBUG env var (1/2/3),
and an architecture pretty-printer replacing BaseModel.print_architecture.
"""
from __future__ import annotations

import logging
import os

ROOT_NAME = "float_tpu"


def initialize_logger(name: str = ROOT_NAME) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s"))
    logger.addHandler(handler)
    level = {"": logging.WARNING, "1": logging.INFO,
             "2": logging.DEBUG, "3": logging.DEBUG - 1}.get(
        os.environ.get("FLOAT_TPU_DEBUG", ""), logging.WARNING)
    logger.setLevel(level)
    return logger


def get_logger(module: str) -> logging.Logger:
    return logging.getLogger(f"{ROOT_NAME}.{module}")
