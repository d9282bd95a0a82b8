"""Structured logging (the reference has only println!; SURVEY.md section 5)."""
from __future__ import annotations

import logging
import os

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(f"curvis_tpu.{name}")
    if not logging.getLogger("curvis_tpu").handlers:
        root = logging.getLogger("curvis_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(handler)
        root.setLevel(os.environ.get("CURVIS_LOG", "INFO").upper())
        root.propagate = False
    return logger
