"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_interpret() -> bool:
    """Pallas kernels compile natively on TPU; everywhere else (the CPU test
    mesh) they run in interpreter mode so the same code path is exercised."""
    return jax.default_backend() != "tpu"
