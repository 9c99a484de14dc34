"""Uniform stdout logging (capability of reference utils.py:5-27)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stdout)
    try:
        handler.stream.reconfigure(encoding="utf-8")
    except Exception:
        pass
    handler.setFormatter(logging.Formatter(_FORMAT))
    root = logging.getLogger("financial_rag_tpu")
    root.addHandler(handler)
    root.setLevel(logging.INFO)
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("financial_rag_tpu"):
        name = f"financial_rag_tpu.{name}"
    return logging.getLogger(name)
