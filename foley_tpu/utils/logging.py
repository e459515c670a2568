"""Logging setup (reference uses loguru with a fixed prefix, ``nodes.py:20-21``)."""

from __future__ import annotations

import logging
import sys

_LOGGER_NAME = "foley-tpu"
_configured = False


def get_logger() -> logging.Logger:
    global _configured
    logger = logging.getLogger(_LOGGER_NAME)
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("HunyuanVideo-Foley[tpu]: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
        _configured = True
    return logger
