"""Structured logging.

The reference logged with bare ``print`` and ad-hoc ``[INFO]``/``[ERROR]``
prefixes (e.g. app/main.py:260, :225-227; SURVEY.md §5). Here it's the stdlib
logging module with one consistent format and per-module loggers.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    root = logging.getLogger("sqe_tpu")
    root.setLevel(os.environ.get("SQE_LOG_LEVEL", "INFO").upper())
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    if not name.startswith("sqe_tpu"):
        name = f"sqe_tpu.{name}"
    return logging.getLogger(name)
