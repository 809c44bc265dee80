"""Structured logging for the framework.

The reference logs with bare prints (sucre.py:134-218). Here a standard
``logging`` logger carries the same messages with levels/timestamps, and
stays print-compatible by default (message-only format on stdout) so the
reference's telemetry lines remain byte-identical for tooling that
parses them. ``SUCRE_TPU_LOG=debug|info|warning`` controls verbosity,
``SUCRE_TPU_LOG_TIMESTAMPS=1`` switches to timestamped records.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "sucre_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        if os.environ.get("SUCRE_TPU_LOG_TIMESTAMPS"):
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
            )
        else:
            handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
        level = os.environ.get("SUCRE_TPU_LOG", "info").upper()
        logger.setLevel(getattr(logging, level, logging.INFO))
        logger.propagate = False
    return logger
